package graft.engine

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's six expression date scopes
  * (account_reports/models/account_report.py:622-654): every measure can be
  * re-evaluated under a rewritten date window (initial balances, fiscal-year
  * openings, prior tax period). Fiscal-year boundaries are company-
  * configurable (:386-394) — here a (month, day) year-end.
  *
  * The scope resolves to a plain Column predicate on the date field, so it
  * composes with any domain filter and still pushes down to the scan.
  */
object DateScope {

  sealed trait Scope
  /** date BETWEEN from AND to. */
  case object StrictRange extends Scope
  /** (date <= to) AND (date >= from OR includeInitialFlag) — the `normal`
    * scope's disjunction (:633-637). */
  case object Normal extends Scope
  /** date <= to (all history up to the period end). */
  case object FromBeginning extends Scope
  /** date < from (everything strictly before the period). */
  case object ToBeginningOfPeriod extends Scope
  /** fiscal-year start of `to` <= date <= to. */
  case object FromFiscalyear extends Scope
  /** date < fiscal-year start of `to`. */
  case object ToBeginningOfFiscalyear extends Scope

  final case class FiscalConfig(lastMonth: Int = 12, lastDay: Int = 31)

  /** Start of the fiscal year containing `d` (reference `compute_fiscalyear_dates`). */
  def fiscalYearStart(d: LocalDate, fc: FiscalConfig): LocalDate = {
    val endThisYear = LocalDate.of(d.getYear, fc.lastMonth, fc.lastDay)
    val end = if (d.isAfter(endThisYear)) endThisYear.plusYears(1) else endThisYear
    end.minusYears(1).plusDays(1)
  }

  /** Compile a scope to a predicate over `dateCol`.
    * `includeInitial` is the `account_id.include_initial_balance` leg of the
    * `normal` scope — pass `lit(false)` when the dimension has no such flag. */
  def predicate(scope: Scope, dateCol: Column, from: LocalDate, to: LocalDate,
                fc: FiscalConfig = FiscalConfig(),
                includeInitial: Column = lit(false)): Column = {
    def d(x: LocalDate): Column = lit(x.toString).cast("timestamp")
    scope match {
      case StrictRange => dateCol >= d(from) && dateCol <= d(to)
      case Normal => dateCol <= d(to) && (dateCol >= d(from) || includeInitial)
      case FromBeginning => dateCol <= d(to)
      case ToBeginningOfPeriod => dateCol < d(from)
      case FromFiscalyear =>
        val fy = fiscalYearStart(to, fc)
        dateCol >= d(fy) && dateCol <= d(to)
      case ToBeginningOfFiscalyear => dateCol < d(fiscalYearStart(to, fc))
    }
  }
}
