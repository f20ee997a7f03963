package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's `account_codes` formula engine
  * (account_reports/models/account_report.py:31-38 for the DSL regexes,
  * :2710-2864 for evaluation): a formula like
  *
  *   `123D\(1234,1236) + 56 - 416C`
  *
  * sums account balances by code prefix, with optional per-term excluded
  * prefixes after `\(...)` and a balance-character gate: `D` keeps an
  * account only when its total balance is debit (>= 0), `C` only when
  * credit (< 0).
  *
  * Evaluation is two-phase like the reference: (1) distributed — aggregate
  * balance per account code (one shuffle on the code); (2) the tiny
  * per-account totals are then prefix-matched, gated, signed and summed.
  * Phase 2 runs as DataFrame expressions too (broadcast of the term list),
  * so nothing is collected to the driver.
  */
object AccountCodes {

  final case class Term(prefix: String, sign: Int, balanceChar: Option[Char],
                        excluded: Seq[String])

  /** Parse the DSL. Terms separated by +/-; each term is
    * `PREFIX[D|C][\(EXCL1,EXCL2,...)]`. */
  def parse(formula: String): Seq[Term] = {
    val termRe = """([+-]?)\s*(\d+)([DC])?(?:\\\(([^)]*)\))?\s*""".r
    termRe.findAllMatchIn(formula).filter(_.group(2) != null).map { m =>
      val sign = if (m.group(1) == "-") -1 else 1
      val excl = Option(m.group(4)).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      Term(m.group(2), sign, Option(m.group(3)).map(_.head), excl)
    }.toSeq
  }

  /** Evaluate a formula over per-account balances.
    * `accounts` must have columns (`code`: string, `balance`: double) — one
    * row per account, i.e. the phase-1 aggregate. Returns a 1-row DataFrame
    * with column `total`. */
  def evaluate(accounts: DataFrame, formula: String): DataFrame = {
    val terms = parse(formula)
    val contribution: Column = terms.map { t =>
      val matches = col("code").startsWith(t.prefix) &&
        t.excluded.foldLeft(lit(true))((acc, ex) => acc && !col("code").startsWith(ex))
      val gate = t.balanceChar match {
        case Some('D') => col("balance") >= 0
        case Some('C') => col("balance") < 0
        case _ => lit(true)
      }
      when(matches && gate, col("balance") * t.sign).otherwise(lit(0.0))
    }.reduce(_ + _)
    accounts.agg(sum(contribution).as("total"))
  }
}
