package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.DateFilter
import graft.engine.DateFilter.{CustomYear, FiscalConfig, Period}

/** Golden values transcribed from the REFERENCE'S OWN date-filter tests
  * (account_reports/tests/test_account_reports_filters.py) — the option
  * algebra every report's column groups are built from: named filters,
  * fiscal-year resolution (computed, overlapping, and explicit custom
  * records), custom-range recognition, and the three comparison
  * filters in both range and single modes. */
class GoldenDateFiltersSpec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)
  private def p(string: String, tpe: String, mode: String, from: String, to: String) =
    Period(string, tpe, mode, Some(d(from)), d(to))

  private val dec31 = d("2017-12-31")

  test("month filters and comparisons in range mode (reference :52-136)") {
    val thisMonth = DateFilter.resolve("this_month", "range", dec31)
    assert(thisMonth == p("Dec 2017", "month", "range", "2017-12-01", "2017-12-31"))
    assert(DateFilter.resolve("last_month", "range", dec31) ==
      p("Nov 2017", "month", "range", "2017-11-01", "2017-11-30"))
    assert(DateFilter.comparisons(thisMonth, "previous_period", 2) == Seq(
      p("Nov 2017", "month", "range", "2017-11-01", "2017-11-30"),
      p("Oct 2017", "month", "range", "2017-10-01", "2017-10-31")))
    assert(DateFilter.comparisons(thisMonth, "same_last_year", 2) == Seq(
      p("Dec 2016", "month", "range", "2016-12-01", "2016-12-31"),
      p("Dec 2015", "month", "range", "2015-12-01", "2015-12-31")))
  }

  test("quarter filters in range mode (reference :137-221)") {
    val thisQ = DateFilter.resolve("this_quarter", "range", dec31)
    assert(thisQ == p("Q4 2017", "quarter", "range", "2017-10-01", "2017-12-31"))
    assert(DateFilter.resolve("last_quarter", "range", dec31) ==
      p("Q3 2017", "quarter", "range", "2017-07-01", "2017-09-30"))
    assert(DateFilter.comparisons(thisQ, "previous_period", 2) == Seq(
      p("Q3 2017", "quarter", "range", "2017-07-01", "2017-09-30"),
      p("Q2 2017", "quarter", "range", "2017-04-01", "2017-06-30")))
    assert(DateFilter.comparisons(thisQ, "same_last_year", 2) == Seq(
      p("Q4 2016", "quarter", "range", "2016-10-01", "2016-12-31"),
      p("Q4 2015", "quarter", "range", "2015-10-01", "2015-12-31")))
  }

  test("calendar fiscal year in range mode (reference :222-305)") {
    val thisY = DateFilter.resolve("this_year", "range", dec31)
    assert(thisY == p("2017", "fiscalyear", "range", "2017-01-01", "2017-12-31"))
    assert(DateFilter.resolve("last_year", "range", dec31) ==
      p("2016", "fiscalyear", "range", "2016-01-01", "2016-12-31"))
    assert(DateFilter.comparisons(thisY, "previous_period", 2) == Seq(
      p("2016", "fiscalyear", "range", "2016-01-01", "2016-12-31"),
      p("2015", "fiscalyear", "range", "2015-01-01", "2015-12-31")))
    // a custom comparison matching a fiscal year is RECOGNIZED (:292-305)
    assert(DateFilter.comparisons(thisY, "custom", 1,
      customFrom = Some(d("2016-01-01")), customTo = Some(d("2016-12-31"))) == Seq(
      p("2016", "fiscalyear", "range", "2016-01-01", "2016-12-31")))
  }

  test("June-30 fiscal year overlaps two years (reference :307-393)") {
    val fc = FiscalConfig(lastMonth = 6, lastDay = 30)
    val thisY = DateFilter.resolve("this_year", "range", dec31, fc)
    assert(thisY == p("2017 - 2018", "fiscalyear", "range", "2017-07-01", "2018-06-30"))
    assert(DateFilter.resolve("last_year", "range", dec31, fc) ==
      p("2016 - 2017", "fiscalyear", "range", "2016-07-01", "2017-06-30"))
    assert(DateFilter.comparisons(thisY, "previous_period", 2, fc) == Seq(
      p("2016 - 2017", "fiscalyear", "range", "2016-07-01", "2017-06-30"),
      p("2015 - 2016", "fiscalyear", "range", "2015-07-01", "2016-06-30")))
  }

  // the reference's nine quarterly account.fiscal.year records (:398-404)
  private val quarterlyYears = FiscalConfig(customYears = (0 until 9).map { i =>
    val to = d("2017-12-31").minusMonths(i * 3)
    val from = LocalDate.of(to.getYear, ((to.getMonthValue - 1) / 3) * 3 + 1, 1)
    CustomYear(s"custom $i", from, from.plusMonths(3).minusDays(1))
  })

  test("custom fiscal-year records drive this_year and its comparisons (reference :395-489)") {
    val thisY = DateFilter.resolve("this_year", "range", dec31, quarterlyYears)
    assert(thisY == p("custom 0", "fiscalyear", "range", "2017-10-01", "2017-12-31"))
    assert(DateFilter.comparisons(thisY, "previous_period", 2, quarterlyYears) == Seq(
      p("custom 1", "fiscalyear", "range", "2017-07-01", "2017-09-30"),
      p("custom 2", "fiscalyear", "range", "2017-04-01", "2017-06-30")))
    // same_last_year shifts the BASE a year per step: Q4 2016 is the
    // fifth record, Q4 2015 the ninth (:***; single-mode twin :944-1011)
    assert(DateFilter.comparisons(thisY, "same_last_year", 2, quarterlyYears) == Seq(
      p("custom 4", "fiscalyear", "range", "2016-10-01", "2016-12-31"),
      p("custom 8", "fiscalyear", "range", "2015-10-01", "2015-12-31")))
  }

  test("custom ranges and their recognition (reference :491-635)") {
    val custom = DateFilter.resolve("custom", "range", dec31,
      customFrom = Some(d("2017-01-01")), customTo = Some(d("2017-01-15")))
    assert(custom == p("From 01/01/2017\nto  01/15/2017", "custom", "range",
      "2017-01-01", "2017-01-15"))
    // previous periods of a custom range are MONTHS before its start
    assert(DateFilter.comparisons(custom, "previous_period", 2) == Seq(
      p("Dec 2016", "month", "range", "2016-12-01", "2016-12-31"),
      p("Nov 2016", "month", "range", "2016-11-01", "2016-11-30")))
    assert(DateFilter.comparisons(custom, "same_last_year", 2) == Seq(
      p("From 01/01/2016\nto  01/15/2016", "custom", "range", "2016-01-01", "2016-01-15"),
      p("From 01/01/2015\nto  01/15/2015", "custom", "range", "2015-01-01", "2015-01-15")))
    // recognition (:555-635): exact month / quarter / fiscal-year covers
    def rec(from: String, to: String, fc: FiscalConfig = FiscalConfig()) =
      DateFilter.resolve("custom", "range", dec31, fc, Some(d(from)), Some(d(to)))
    assert(rec("2017-12-01", "2017-12-31") ==
      p("Dec 2017", "month", "range", "2017-12-01", "2017-12-31"))
    assert(rec("2017-10-01", "2017-12-31") ==
      p("Q4 2017", "quarter", "range", "2017-10-01", "2017-12-31"))
    assert(rec("2017-01-01", "2017-12-31") ==
      p("2017", "fiscalyear", "range", "2017-01-01", "2017-12-31"))
    assert(rec("2016-07-01", "2017-06-30", FiscalConfig(lastMonth = 6, lastDay = 30)) ==
      p("2016 - 2017", "fiscalyear", "range", "2016-07-01", "2017-06-30"))
    assert(rec("2017-10-01", "2017-12-31",
      FiscalConfig(customYears = Seq(CustomYear("custom 0", d("2017-10-01"), d("2017-12-31"))))) ==
      p("custom 0", "fiscalyear", "range", "2017-10-01", "2017-12-31"))
  }

  test("a calendar year under a non-calendar fiscal config recognizes as 'year' (reference account_report.py:374-375)") {
    val fc = FiscalConfig(lastMonth = 6, lastDay = 30)
    val y = DateFilter.resolve("custom", "range", dec31, fc,
      customFrom = Some(d("2017-01-01")), customTo = Some(d("2017-12-31")))
    assert(y == p("2017", "year", "range", "2017-01-01", "2017-12-31"))
    // previous_period steps CALENDAR years (account_report.py:437-438),
    // never snapping to the company's June-30 fiscal year
    assert(DateFilter.comparisons(y, "previous_period", 2, fc) == Seq(
      p("2016", "year", "range", "2016-01-01", "2016-12-31"),
      p("2015", "year", "range", "2015-01-01", "2015-12-31")))
    // same_last_year keeps the 'year' type through the plain shift
    assert(DateFilter.comparisons(y, "same_last_year", 1, fc) == Seq(
      p("2016", "year", "range", "2016-01-01", "2016-12-31")))
  }

  test("a (month start, today) range recognizes as 'today' (reference account_report.py:376-377)") {
    // mid-month, so the full-month branch (checked first) cannot match
    val mid = d("2017-12-15")
    val t = DateFilter.resolve("custom", "range", mid,
      customFrom = Some(d("2017-12-01")), customTo = Some(mid))
    assert(t.periodType == "today")
    assert((t.dateFrom.get, t.dateTo) == ((d("2017-12-01"), mid)))
    // but the same shape NOT ending today stays a month or custom range
    val notToday = DateFilter.resolve("custom", "range", dec31,
      customFrom = Some(d("2017-11-01")), customTo = Some(d("2017-11-15")))
    assert(notToday.periodType == "custom")
    // a 'today' period steps previous periods through fiscal years
    // (_get_dates_previous_period groups it with fiscalyear, :432-436):
    // the year containing the eve of Dec 1
    assert(DateFilter.comparisons(t, "previous_period", 1) == Seq(
      p("2017", "fiscalyear", "range", "2017-01-01", "2017-12-31")))
  }

  test("same_last_year on a custom-record fiscal year keeps the shifted shape (reference :441-459)") {
    // ONE quarterly record for Q4 2017 only: the shifted year has no
    // record, so the result must be the plain shift of both dates — not
    // the computed company year around the shifted date
    val fc = FiscalConfig(customYears =
      Seq(CustomYear("my q4", d("2017-10-01"), d("2017-12-31"))))
    val base = DateFilter.resolve("this_year", "range", dec31, fc)
    assert(base == p("my q4", "fiscalyear", "range", "2017-10-01", "2017-12-31"))
    assert(DateFilter.comparisons(base, "same_last_year", 1, fc) == Seq(
      p("2016", "fiscalyear", "range", "2016-10-01", "2016-12-31")))
  }

  test("single mode: today anchors at the fiscal-year start (reference :637-707)") {
    val today = DateFilter.resolve("today", "single", d("2017-12-30"))
    assert(today == p("As of 12/30/2017", "today", "single", "2017-01-01", "2017-12-30"))
    // previous periods of "today" are whole fiscal years
    assert(DateFilter.comparisons(today, "previous_period", 2) == Seq(
      p("As of 12/31/2016", "fiscalyear", "single", "2016-01-01", "2016-12-31"),
      p("As of 12/31/2015", "fiscalyear", "single", "2015-01-01", "2015-12-31")))
    assert(DateFilter.comparisons(today, "same_last_year", 2) == Seq(
      p("As of 12/30/2016", "today", "single", "2016-01-01", "2016-12-30"),
      p("As of 12/30/2015", "today", "single", "2015-01-01", "2015-12-30")))
    // a single-mode custom comparison has NO date_from (:698-707)
    assert(DateFilter.comparisons(today, "custom", 1,
      customTo = Some(d("2016-12-31"))) == Seq(
      Period("As of 12/31/2016", "custom", "single", None, d("2016-12-31"))))
  }

  test("single mode: month and quarter strings render As-of (reference :709-825)") {
    val thisMonth = DateFilter.resolve("this_month", "single", dec31)
    assert(thisMonth == p("As of 12/31/2017", "month", "single", "2017-12-01", "2017-12-31"))
    assert(DateFilter.comparisons(thisMonth, "previous_period", 2) == Seq(
      p("As of 11/30/2017", "month", "single", "2017-11-01", "2017-11-30"),
      p("As of 10/31/2017", "month", "single", "2017-10-01", "2017-10-31")))
    assert(DateFilter.comparisons(thisMonth, "same_last_year", 2) == Seq(
      p("As of 12/31/2016", "month", "single", "2016-12-01", "2016-12-31"),
      p("As of 12/31/2015", "month", "single", "2015-12-01", "2015-12-31")))
    val thisQ = DateFilter.resolve("this_quarter", "single", dec31)
    assert(thisQ == p("As of 12/31/2017", "quarter", "single", "2017-10-01", "2017-12-31"))
    assert(DateFilter.comparisons(thisQ, "previous_period", 2) == Seq(
      p("As of 09/30/2017", "quarter", "single", "2017-07-01", "2017-09-30"),
      p("As of 06/30/2017", "quarter", "single", "2017-04-01", "2017-06-30")))
  }

  test("single mode: custom fiscal years keep their names (reference :944-1011)") {
    val thisY = DateFilter.resolve("this_year", "single", dec31, quarterlyYears)
    assert(thisY == p("custom 0", "fiscalyear", "single", "2017-10-01", "2017-12-31"))
    assert(DateFilter.comparisons(thisY, "previous_period", 2, quarterlyYears) == Seq(
      p("custom 1", "fiscalyear", "single", "2017-07-01", "2017-09-30"),
      p("custom 2", "fiscalyear", "single", "2017-04-01", "2017-06-30")))
    assert(DateFilter.comparisons(thisY, "same_last_year", 2, quarterlyYears) == Seq(
      p("custom 4", "fiscalyear", "single", "2016-10-01", "2016-12-31"),
      p("custom 8", "fiscalyear", "single", "2015-10-01", "2015-12-31")))
  }

  test("single mode: a custom date anchors at its month start (reference :1013-1113)") {
    val custom = DateFilter.resolve("custom", "single", dec31,
      customTo = Some(d("2018-01-15")))
    assert(custom == p("As of 01/15/2018", "custom", "single", "2018-01-01", "2018-01-15"))
    assert(DateFilter.comparisons(custom, "previous_period", 2) == Seq(
      p("As of 12/31/2017", "month", "single", "2017-12-01", "2017-12-31"),
      p("As of 11/30/2017", "month", "single", "2017-11-01", "2017-11-30")))
    assert(DateFilter.comparisons(custom, "same_last_year", 2) == Seq(
      p("As of 01/15/2017", "custom", "single", "2017-01-01", "2017-01-15"),
      p("As of 01/15/2016", "custom", "single", "2016-01-01", "2016-01-15")))
    // the stale period_type from previous options is ignored (:1071-1113)
    val mid = DateFilter.resolve("custom", "single", d("2021-09-01"),
      customTo = Some(d("2019-07-18")))
    assert(mid == p("As of 07/18/2019", "custom", "single", "2019-07-01", "2019-07-18"))
    assert(DateFilter.comparisons(mid, "previous_period", 2) == Seq(
      p("As of 06/30/2019", "month", "single", "2019-06-01", "2019-06-30"),
      p("As of 05/31/2019", "month", "single", "2019-05-01", "2019-05-31")))
  }
}
