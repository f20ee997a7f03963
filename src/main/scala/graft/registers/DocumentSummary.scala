package graft.registers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-summary register (reference
  * etl_account/wizard/document_summary.py:37-200): for each "nature of
  * document" — a domain over the journal (move type + sale type) — report
  * the serial-number range issued in the period (first/last document name
  * in (date, name) order), the total number of documents, how many were
  * cancelled, and the net issued.
  *
  * The reference runs one ORM `search(order='date,name')` PER section and
  * walks the recordset in Python (first/last element, len, a cancelled
  * list-comprehension). Spark-first this is ONE scan: rows are tagged with
  * their section by a when-chain over the section predicates, then a single
  * groupBy computes count / cancelled-count / min / max per section, and a
  * broadcast join against the tiny section dim pins every declared section
  * in the output (empty sections appear with zero counts and null serials,
  * the blank cells of the reference sheet).
  *
  * Serial-range ordering: the reference's first/last is over
  * `order='date,name'`; we take min/max of the sortable key
  * `yyyy-MM-dd date || '|' || name` and split the name back out —
  * portable lexicographic comparison, no ordered window needed. Document
  * names must not contain '|'.
  *
  * Reference quirk, preserved: for sections flagged `netInTotalCol`
  * (the Debit Note row, document_summary.py:172-177) the sheet swaps the
  * columns — "Total No." holds net issued and "Nett. Issued" holds the
  * gross count.
  */
object DocumentSummary {

  /** One "nature of document" row: `pred` is the section's domain. */
  final case class Section(ord: Long, nature: String, pred: Column,
                           netInTotalCol: Boolean = false)

  /** `name`: document serial; `date`: document date; `cancelled`: true for
    * cancelled documents (reference: state = 'cancel'). Sections should be
    * disjoint; overlapping rows land in the first matching section. */
  def compute(moves: DataFrame, name: Column, date: Column,
              cancelled: Column, sections: Seq[Section]): DataFrame = {
    val spark = moves.sparkSession
    import spark.implicits._
    val ordOf = sections.foldRight(lit(null).cast("long")) { (s, rest) =>
      when(s.pred, lit(s.ord)).otherwise(rest)
    }
    val key = concat(date_format(date, "yyyy-MM-dd"), lit("|"), name)
    val agg = moves
      .select(ordOf.as("ord"), key.as("k"), cancelled.as("c"))
      .filter(col("ord").isNotNull)
      .groupBy(col("ord"))
      .agg(min(col("k")).as("k_from"), max(col("k")).as("k_to"),
        count(lit(1)).as("total"),
        sum(when(col("c"), 1L).otherwise(0L)).as("cancelled"))
    val dim = sections.map(s => (s.ord, s.nature, s.netInTotalCol))
      .toDF("ord", "nature", "swap")
    broadcast(dim).join(agg, Seq("ord"), "left")
      .select(col("ord"), col("nature"),
        substring_index(col("k_from"), "|", -1).as("serial_from"),
        substring_index(col("k_to"), "|", -1).as("serial_to"),
        when(col("swap"), col("total") - col("cancelled"))
          .otherwise(col("total")).cast("long").as("total_no"),
        coalesce(col("cancelled"), lit(0L)).cast("long").as("cancelled_no"),
        when(col("swap"), col("total"))
          .otherwise(col("total") - col("cancelled")).cast("long")
          .as("net_issued"))
      .na.fill(0L, Seq("total_no", "net_issued"))
      .orderBy(col("ord"))
  }
}
