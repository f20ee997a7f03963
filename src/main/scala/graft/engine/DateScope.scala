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
  /** The tax period immediately before the one starting at `from`
    * (account_report.py:650-653: the period containing `from - 1 day`,
    * res_company.py:217-227 `_get_tax_closing_period_boundaries`), for a
    * company tax periodicity of `periodicityMonths` (res_company.py:229-240:
    * year=12, semester=6, trimester=3, monthly=1...). Carries the applied-
    * carryover external values of the previous VAT period. */
  final case class PreviousTaxPeriod(periodicityMonths: Int = 12) extends Scope

  final case class FiscalConfig(lastMonth: Int = 12, lastDay: Int = 31)

  /** Boundaries of the tax period containing `d` for a periodicity of
    * `months` (res_company.py:217-227): month-aligned windows of `months`
    * months counted from January. */
  def taxPeriodBoundaries(d: LocalDate, months: Int): (LocalDate, LocalDate) = {
    require(months >= 1 && 12 % months == 0, s"bad periodicity: $months")
    val periodNumber = d.getMonthValue / months +
      (if (d.getMonthValue % months != 0) 1 else 0)
    val end = LocalDate.of(d.getYear, periodNumber * months, 1)
      .plusMonths(1).minusDays(1)
    val start = end.withDayOfMonth(1).minusMonths(months - 1)
    (start, end)
  }

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
      case PreviousTaxPeriod(m) =>
        val (pf, pt) = taxPeriodBoundaries(from.minusDays(1), m)
        dateCol >= d(pf) && dateCol <= d(pt)
    }
  }

  /** The scope as a closed [from?, to] date window (account_report.py:
    * 622-654 `_get_date_bounds_info`) — the form the external-values engine
    * consumes, filtering its value table by date bounds rather than a fact
    * predicate. `Normal`'s include-initial-balance leg is per-account and
    * has no closed window; for value tables it degrades to the strict
    * range, as the reference's bounds do. */
  def bounds(scope: Scope, from: LocalDate, to: LocalDate,
             fc: FiscalConfig = FiscalConfig()): (Option[LocalDate], LocalDate) =
    scope match {
      case StrictRange | Normal => (Some(from), to)
      case FromBeginning => (None, to)
      case ToBeginningOfPeriod => (None, from.minusDays(1))
      case FromFiscalyear => (Some(fiscalYearStart(to, fc)), to)
      case ToBeginningOfFiscalyear => (None, fiscalYearStart(to, fc).minusDays(1))
      case PreviousTaxPeriod(m) =>
        val (pf, pt) = taxPeriodBoundaries(from.minusDays(1), m)
        (Some(pf), pt)
    }
}
