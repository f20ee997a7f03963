package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bank-statement CSV import (reference
  * etl_account/wizard/statement_import.py:action_import): the statement
  * file layout is
  *
  * {{{
  *   row 1: header for the balance row
  *   row 2: starting_balance, ending_balance, narration
  *   row 3: header for the line rows
  *   row 4…: date (dd-MM-yyyy), payment_ref, amount ("1,234.56" —
  *           thousands separators stripped)
  * }}}
  *
  * The reference consumes rows 1–3 in a bounded Python loop, validates the
  * starting balance against the previous statement's ending balance, then
  * creates one statement-line record per remaining row with the date
  * normalized to yyyy-MM-dd and the amount comma-stripped to float.
  *
  * Spark-first: the 3 prologue rows are read driver-side (a bounded
  * 3-line read — statement prologues are O(1) by format); the LINE table
  * is a distributed `spark.read.csv` of the same file with the prologue
  * rows dropped structurally — a line row is exactly a row whose first
  * field parses as a dd-MM-yyyy date, which neither header row nor the
  * numeric balance row does. Normalization (date reformat, comma strip,
  * 2-decimal half-up) happens in codegen'd column expressions, so a
  * million-line statement never touches the driver.
  */
object StatementImport {

  /** Parsed statement: header balances + the distributed line table
    * (columns: date yyyy-MM-dd string, payment_ref, amount double), plus
    * `rejects` — data-shaped rows whose date parses as NEITHER a line nor
    * the prologue (wrong format, impossible date). The reference wizard
    * raises on the first bad row; a distributed importer surfaces them
    * all so the caller can fail (`require(rejects.isEmpty)`) or route
    * them to a quarantine sink. */
  final case class Statement(balanceStart: Double, balanceEnd: Double,
                             narration: String, lines: DataFrame,
                             rejects: DataFrame)

  /** Starting balance must chain from the previous statement's ending
    * balance (reference raises UserError otherwise). */
  final case class BalanceMismatch(expected: Double, got: Double)
    extends RuntimeException(
      s"Starting Balance $got should match with Previous Statement " +
        s"Ending Balance $expected")

  private def r2(x: Double): Double = math.floor(x * 100 + 0.5) / 100

  /** Minimal quote-aware CSV field split for the prologue row (the
    * narration may be quoted and contain commas, like the reference's
    * csv_reader handles); `""` inside quotes unescapes to `"`. */
  private def splitCsv(line: String, max: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') inQ = false
        else cur += c
      } else if (c == '"') inQ = true
      else if (c == ',' && out.length < max - 1) { out += cur.result(); cur.clear() }
      else cur += c
      i += 1
    }
    out += cur.result()
    out.toArray
  }

  def read(spark: SparkSession, path: String,
           previousEnding: Option[Double] = None): Statement = {
    // Bounded prologue read: ≤3 CSV rows (file header, balances, column
    // header), never the line table. The third row's full tuple joins the
    // reject exclusions below — harmless when it is really a data row,
    // because a parseable date never reaches the reject filter.
    val src = scala.io.Source.fromFile(path)
    val prologue = try src.getLines().take(3).toList finally src.close()
    require(prologue.length >= 2, s"statement file $path has no balance row")
    val bal = splitCsv(prologue(1), 3)
    val start = r2(bal(0).trim.toDouble)
    val end = r2(bal(1).trim.toDouble)
    val narration = if (bal.length > 2) bal(2).trim else ""
    previousEnding.foreach { prev =>
      if (r2(prev) != start) throw BalanceMismatch(r2(prev), start)
    }
    // amounts may be quoted ("1,234.56") — let the CSV parser unquote,
    // then strip the thousands separators before the cast
    val raw = spark.read
      .option("header", "false").option("quote", "\"")
      .csv(path)
      .toDF("c0", "c1", "c2")
    // try_to_date: ANSI mode (Spark 4 default) would make a plain to_date
    // throw on the prologue rows instead of filtering them out
    val dt = expr("try_to_date(c0, 'dd-MM-yyyy')")
    val lines = raw
      .filter(dt.isNotNull)
      .select(
        date_format(dt, "yyyy-MM-dd").as("date"),
        col("c1").as("payment_ref"),
        regexp_replace(col("c2"), ",", "").cast("double").as("amount"))
    // a malformed DATA row must not silently vanish with the prologue:
    // exclude the prologue by matching the FULL row tuple (ADVICE r4 —
    // first-field-only matching swallowed any malformed data row whose c0
    // coincidentally equalled e.g. "Date" or the balance figure string).
    // Spark's CSV reader yields null for absent/empty trailing fields;
    // normalize the driver-parsed prologue fields the same way.
    val prologueRows = prologue.map { r =>
      val p = splitCsv(r, 3)
      (0 until 3).map(i => p.lift(i).filter(_.nonEmpty).orNull)
    }
    val isPrologueRow = prologueRows.map { p =>
      col("c0") <=> lit(p(0)) && col("c1") <=> lit(p(1)) && col("c2") <=> lit(p(2))
    }.reduce(_ || _)
    val rejects = raw
      .filter(dt.isNull && !isPrologueRow)
      .select(col("c0"), col("c1"), col("c2"))
    Statement(start, end, narration, lines, rejects)
  }
}
