package graft.engine

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale

/** The report date-filter algebra (reference
  * account_reports/models/account_report.py `_init_options_date` /
  * `_get_dates_period` / `_get_dates_previous_period` — golden-tested by
  * account_reports/tests/test_account_reports_filters.py): named filters
  * ("this_month", "last_quarter", "this_year", "today", "custom")
  * resolve to a dated period with a display string and a recognized
  * period type, and comparison filters ("previous_period",
  * "same_last_year", "custom") derive chains of prior periods.
  *
  * Fiscal years honor explicit custom fiscal-year records first (the
  * reference's account.fiscal.year rows — arbitrary, e.g. quarterly,
  * periods), then the company's (last month, last day) year end.
  * "custom" ranges are RECOGNIZED: a range that exactly covers a month /
  * quarter / fiscal year re-labels to that period type. In single mode
  * every string renders "As of <date>" (a named custom fiscal year keeps
  * its name) and a custom single date anchors date_from at its month
  * start. Pure driver-side date arithmetic — no Spark surface. */
object DateFilter {

  final case class CustomYear(name: String, from: LocalDate, to: LocalDate)
  final case class FiscalConfig(lastMonth: Int = 12, lastDay: Int = 31,
                                customYears: Seq[CustomYear] = Nil)
  /** `dateFrom` is None only for a single-mode custom comparison (the
    * reference emits date_from=False there). */
  final case class Period(string: String, periodType: String, mode: String,
                          dateFrom: Option[LocalDate], dateTo: LocalDate)

  private val fmtDate = DateTimeFormatter.ofPattern("MM/dd/yyyy")
  private val fmtMonth = DateTimeFormatter.ofPattern("MMM yyyy", Locale.US)

  private def monthBounds(d: LocalDate): (LocalDate, LocalDate) = {
    val f = d.withDayOfMonth(1); (f, f.plusMonths(1).minusDays(1))
  }
  private def quarterBounds(d: LocalDate): (LocalDate, LocalDate) = {
    val f = LocalDate.of(d.getYear, ((d.getMonthValue - 1) / 3) * 3 + 1, 1)
    (f, f.plusMonths(3).minusDays(1))
  }
  /** Fiscal year containing `d`: custom records first, else computed. */
  private def fyBounds(d: LocalDate, fc: FiscalConfig)
      : (LocalDate, LocalDate, Option[String]) =
    fc.customYears.find(y => !d.isBefore(y.from) && !d.isAfter(y.to))
      .map(y => (y.from, y.to, Some(y.name)))
      .getOrElse {
        val start = DateScope.fiscalYearStart(d,
          DateScope.FiscalConfig(fc.lastMonth, fc.lastDay))
        (start, start.plusYears(1).minusDays(1), None)
      }

  private def fyString(from: LocalDate, to: LocalDate, name: Option[String]): String =
    name.getOrElse(
      if (from.getYear == to.getYear) to.getYear.toString
      else s"${from.getYear} - ${to.getYear}")

  private def rangeString(periodType: String, from: LocalDate, to: LocalDate,
                          fyName: Option[String]): String = periodType match {
    case "month" => fmtMonth.format(to)
    case "quarter" => s"Q${(to.getMonthValue - 1) / 3 + 1} ${to.getYear}"
    case "fiscalyear" => fyString(from, to, fyName)
    case "year" => to.getYear.toString
    case _ => s"From ${fmtDate.format(from)}\nto  ${fmtDate.format(to)}"
  }

  private def calendarYear(d: LocalDate): (LocalDate, LocalDate) =
    (LocalDate.of(d.getYear, 1, 1), LocalDate.of(d.getYear, 12, 31))

  private def mk(periodType: String, mode: String, from: LocalDate,
                 to: LocalDate, fyName: Option[String] = None): Period = {
    val s =
      if (mode == "single") fyName.getOrElse(s"As of ${fmtDate.format(to)}")
      else rangeString(periodType, from, to, fyName)
    Period(s, periodType, mode, Some(from), to)
  }

  /** Resolve a named filter at `today` (account_report.py
    * `_get_dates_period`; custom dates via `customFrom`/`customTo`). */
  def resolve(filter: String, mode: String, today: LocalDate,
              fc: FiscalConfig = FiscalConfig(),
              customFrom: Option[LocalDate] = None,
              customTo: Option[LocalDate] = None): Period = filter match {
    case "today" =>
      val (fyFrom, _, _) = fyBounds(today, fc)
      mk("today", mode, fyFrom, today)
    case "this_month" | "last_month" =>
      val base = if (filter == "this_month") today else monthBounds(today)._1.minusDays(1)
      val (f, t) = monthBounds(base); mk("month", mode, f, t)
    case "this_quarter" | "last_quarter" =>
      val base = if (filter == "this_quarter") today else quarterBounds(today)._1.minusDays(1)
      val (f, t) = quarterBounds(base); mk("quarter", mode, f, t)
    case "this_year" | "last_year" =>
      val (f0, _, _) = fyBounds(today, fc)
      val (f, t, n) = if (filter == "this_year") fyBounds(today, fc)
        else fyBounds(f0.minusDays(1), fc)
      mk("fiscalyear", mode, f, t, n)
    case "custom" if mode == "single" =>
      val to = customTo.get
      mk("custom", mode, to.withDayOfMonth(1), to)
    case "custom" =>
      val (from, to) = (customFrom.get, customTo.get)
      // recognition order: an exactly-matching CUSTOM fiscal-year record
      // wins even over a month/quarter-shaped range
      // (test_account_reports_filters.py:616-635), then month, quarter,
      // computed fiscal year
      val customFy = fc.customYears.find(y => y.from == from && y.to == to)
      val recognized =
        if (customFy.isDefined) "fiscalyear"
        else if (monthBounds(to) == ((from, to))) "month"
        else if (quarterBounds(to) == ((from, to))) "quarter"
        else {
          val (ff, ft, _) = fyBounds(to, fc)
          if ((ff, ft) == ((from, to))) "fiscalyear"
          // the reference's trailing branches (account_report.py:374-378):
          // a CALENDAR year under a non-calendar fiscal config is 'year',
          // and (month start, today) is 'today'
          else if (calendarYear(to) == ((from, to))) "year"
          else if (from == monthBounds(to)._1 && to == today) "today"
          else "custom"
        }
      val fyName = if (recognized == "fiscalyear") fyBounds(to, fc)._3 else None
      mk(recognized, mode, from, to, fyName)
  }

  /** Derive the comparison chain (`_get_dates_previous_period` for
    * "previous_period", the year-shift rule for "same_last_year", a
    * single recognized period for "custom"). */
  def comparisons(base: Period, compFilter: String, n: Int,
                  fc: FiscalConfig = FiscalConfig(),
                  customFrom: Option[LocalDate] = None,
                  customTo: Option[LocalDate] = None): Seq[Period] = {
    compFilter match {
      case "previous_period" =>
        // a custom period steps back through MONTHS; "today" through
        // fiscal years; everything else through its own period type
        val stepType = base.periodType match {
          case "custom" => "month"
          case "today" => "fiscalyear"
          case t => t
        }
        Iterator.iterate(base) { p =>
          val eve = p.dateFrom.get.minusDays(1)
          stepType match {
            case "month" => val (f, t) = monthBounds(eve); mk("month", base.mode, f, t)
            case "quarter" => val (f, t) = quarterBounds(eve); mk("quarter", base.mode, f, t)
            case "year" =>
              // a 'year' period steps through CALENDAR years
              // (account_report.py:437-438), not the company fiscal year
              val (f, t) = calendarYear(eve); mk("year", base.mode, f, t)
            case _ =>
              val (f, t, name) = fyBounds(eve, fc)
              mk("fiscalyear", base.mode, f, t, name)
          }
        }.drop(1).take(n).toSeq
      case "same_last_year" =>
        // the reference shifts BOTH dates plainly by a year and keeps the
        // period type (_get_dates_previous_year, account_report.py:
        // 441-459); only 'month' re-derives its bounds from the shifted
        // date_to, and a fiscalyear period re-reads only the DISPLAY
        // name from a record containing the shifted date — with custom
        // fiscal-year records not covering the shifted year the result
        // keeps the shifted record shape, never snaps to the computed
        // company year
        (1 to n).map { i =>
          val f0 = base.dateFrom.get.minusYears(i)
          val t0 = base.dateTo.minusYears(i)
          base.periodType match {
            case "month" =>
              val (f, t) = monthBounds(t0); mk("month", base.mode, f, t)
            case "fiscalyear" =>
              val name = fc.customYears
                .find(y => !t0.isBefore(y.from) && !t0.isAfter(y.to)).map(_.name)
              mk("fiscalyear", base.mode, f0, t0, name)
            case t => mk(t, base.mode, f0, t0)
          }
        }
      case "custom" =>
        if (base.mode == "single")
          Seq(Period(s"As of ${fmtDate.format(customTo.get)}", "custom",
            "single", None, customTo.get))
        else
          Seq(resolve("custom", base.mode, base.dateTo, fc, customFrom, customTo))
      case other => throw new IllegalArgumentException(s"comparison filter: $other")
    }
  }
}
