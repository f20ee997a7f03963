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

  /** Parse the DSL — the reference's exact token grammar
    * (account_report.py:31-38 ACCOUNT_CODES_ENGINE_SPLIT_REGEX /
    * ACCOUNT_CODES_ENGINE_TERM_REGEX): terms split BEFORE each +/-; a
    * term is `PREFIX[\(EXCL1,EXCL2,...)][D|C]`. Prefixes may contain
    * letters and dots; a trailing D/C binds to the prefix when an
    * exclusion group follows (so `345D\()D` is account prefix "345D"
    * gated on debit balance, and a D-gated 123 excluding 1234 is written
    * `123\(1234)D`). Invalid tokens raise, like the reference's
    * UserError (account_report.py:2747). */
  def parse(formula: String): Seq[Term] = {
    val termRe = ("""^(?<sign>[+-]?)(?<prefix>[A-Za-z\d.]*((?=\\)|(?<=[^CD])))""" +
      """(?:\\\((?<excl>(?:[A-Za-z\d.]+,)*[A-Za-z\d.]*)\))?(?<bal>[DC]?)$""").r
    formula.replace(" ", "").split("(?=[+-])").toSeq.filter(_.nonEmpty).map { token =>
      termRe.findFirstMatchIn(token).map { m =>
        val excl = Option(m.group("excl"))
          .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
        Term(m.group("prefix"), if (m.group("sign") == "-") -1 else 1,
          Option(m.group("bal")).filter(_.nonEmpty).map(_.head), excl)
      }.getOrElse(throw new IllegalArgumentException(
        s"invalid account_codes token '$token' in formula '$formula'"))
    }
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
