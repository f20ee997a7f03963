package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.JournalFilter
import graft.engine.JournalFilter._

/** The journal-filter state machine, transcribed from the REFERENCE'S
  * OWN test file (account_reports/tests/
  * test_account_reports_journal_filter.py) — all five scenarios with
  * their full expected selector matrices: single-company selection and
  * name abbreviation, multi-company dividers, group check/uncheck
  * semantics, the first-load group default, and the all-selected
  * collapse back to "All Journals".
  */
class GoldenJournalFilterSpec extends AnyFunSuite {

  private def j(id: Long, name: String, company: String) =
    Journal(id, name, name, company)

  /** The (id, selected) view of the journal rows, dividers as id -1. */
  private def matrix(o: Options): Seq[(Long, Boolean)] = o.rows.map {
    case Divider(_, _) => (-1L, false)
    case GroupRow(id, _, s) => (id, s)
    case JournalRow(id, _, s) => (id, s)
  }

  test("single company: selection, abbreviation, all-selected collapse (reference :62-152)") {
    val js = (1L to 8L).map(i => j(i, s"j$i", "c1"))
    val c = Seq("c1")

    val o0 = initOptions(js, Nil, c, previousSelected = None)
    assert(o0.displayName == "All Journals")
    assert(matrix(o0) == (1L to 8L).map(i => (i, false)))

    // select j1/j2/j3
    val o1 = initOptions(js, Nil, c, Some(Set(1L, 2L, 3L)))
    assert(o1.displayName == "j1, j2, j3")
    assert(matrix(o1) == Seq(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false, 7L -> false, 8L -> false))

    // select j4/j5/j6 too → six names abbreviate to "one other"
    val o2 = initOptions(js, Nil, c, Some(Set(1L, 2L, 3L, 4L, 5L, 6L)))
    assert(o2.displayName == "j1, j2, j3, j4, j5 and one other")
    assert(matrix(o2) == Seq(1L -> true, 2L -> true, 3L -> true,
      4L -> true, 5L -> true, 6L -> true, 7L -> false, 8L -> false))

    // select j7 → "2 others"
    val o3 = initOptions(js, Nil, c, Some((1L to 7L).toSet))
    assert(o3.displayName == "j1, j2, j3, j4, j5 and 2 others")
    assert(matrix(o3) == ((1L to 7L).map(i => (i, true)) :+ (8L -> false)))

    // select j8 → everything selected collapses to All Journals, unselected
    val o4 = initOptions(js, Nil, c, Some((1L to 8L).toSet))
    assert(o4.displayName == "All Journals")
    assert(matrix(o4) == (1L to 8L).map(i => (i, false)))
  }

  test("multi company: per-company dividers, name order follows company blocks (reference :154-195)") {
    // j1,j2,j5,j6 in company 1; j3,j4,j7,j8 in company 2
    val js = Seq(j(1, "j1", "c1"), j(2, "j2", "c1"), j(3, "j3", "c2"),
      j(4, "j4", "c2"), j(5, "j5", "c1"), j(6, "j6", "c1"),
      j(7, "j7", "c2"), j(8, "j8", "c2"))
    val c = Seq("c1", "c2")

    val o0 = initOptions(js, Nil, c, None)
    assert(o0.displayName == "All Journals")
    assert(matrix(o0) == Seq(-1L -> false, 1L -> false, 2L -> false,
      5L -> false, 6L -> false, -1L -> false, 3L -> false, 4L -> false,
      7L -> false, 8L -> false))

    // select j1/j3/j5/j7 → codes grouped per company: "j1, j5, j3, j7"
    val o1 = initOptions(js, Nil, c, Some(Set(1L, 3L, 5L, 7L)))
    assert(o1.displayName == "j1, j5, j3, j7")
    assert(matrix(o1) == Seq(-1L -> false, 1L -> true, 2L -> false,
      5L -> true, 6L -> false, -1L -> false, 3L -> true, 4L -> false,
      7L -> true, 8L -> false))
  }

  test("groups, single company: first-load default, group toggle, uncheck clears (reference :197-254)") {
    val js = (1L to 6L).map(i => j(i, s"j$i", "c1"))
    val g1 = Group(101, "g1", "c1", Set(2L, 4L), 1)
    val g2 = Group(102, "g2", "c1", Set(2L, 5L), 2)
    val c = Seq("c1")

    // first load auto-selects the first group
    val o0 = initOptions(js, Seq(g1, g2), c, None)
    assert(o0.displayName == "g1")
    assert(matrix(o0) == Seq(-1L -> false, 101L -> true, 102L -> false,
      -1L -> false, 1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> true))

    // check g2
    val o1 = initOptions(js, Seq(g1, g2), c, Some(o0.selected("c1")),
      Some(GroupAction("add", 102)))
    assert(o1.displayName == "g2")
    assert(matrix(o1) == Seq(-1L -> false, 101L -> false, 102L -> true,
      -1L -> false, 1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> false, 6L -> true))

    // uncheck g2 → nothing else selected anywhere → All Journals
    val o2 = initOptions(js, Seq(g1, g2), c, Some(o1.selected("c1")),
      Some(GroupAction("remove", 102)))
    assert(o2.displayName == "All Journals")
    assert(matrix(o2) == Seq(-1L -> false, 101L -> false, 102L -> false,
      -1L -> false, 1L -> false, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false))
  }

  test("groups, multi company: per-company defaults, keep-everything uncheck, full collapse (reference :256-341)") {
    val js = Seq(j(1, "j1", "c1"), j(2, "j2", "c1"), j(3, "j3", "c1"),
      j(4, "j4", "c1"), j(5, "j5", "c2"), j(6, "j6", "c2"))
    val g1 = Group(101, "g1", "c1", Set(2L, 3L), 1)
    val g2 = Group(102, "g2", "c1", Set(2L, 4L), 2)
    val g3 = Group(103, "g3", "c2", Set(6L), 3)
    val gs = Seq(g1, g2, g3)
    val c = Seq("c1", "c2")

    val o0 = initOptions(js, gs, c, None)
    assert(o0.displayName == "g1, g3")
    assert(matrix(o0) == Seq(-1L -> false, 101L -> true, 102L -> false,
      103L -> true, -1L -> false, 1L -> true, 2L -> false, 3L -> false,
      4L -> true, -1L -> false, 5L -> true, 6L -> false))

    // check g2
    def sel(o: Options) = Some(o.selected.values.flatten.toSet)
    val o1 = initOptions(js, gs, c, sel(o0), Some(GroupAction("add", 102)))
    assert(o1.displayName == "g2, g3")
    assert(matrix(o1) == Seq(-1L -> false, 101L -> false, 102L -> true,
      103L -> true, -1L -> false, 1L -> true, 2L -> false, 3L -> true,
      4L -> false, -1L -> false, 5L -> true, 6L -> false))

    // uncheck g2: company 2 still has a selection, so company 1 keeps
    // everything — codes spelled out next to g3
    val o2 = initOptions(js, gs, c, sel(o1), Some(GroupAction("remove", 102)))
    assert(o2.displayName == "g3, j1, j2, j3, j4")
    assert(matrix(o2) == Seq(-1L -> false, 101L -> false, 102L -> false,
      103L -> true, -1L -> false, 1L -> true, 2L -> true, 3L -> true,
      4L -> true, -1L -> false, 5L -> true, 6L -> false))

    // uncheck g3: the keep-everything rule would leave ALL companies
    // full → collapses to no selection at all
    val o3 = initOptions(js, gs, c, sel(o2), Some(GroupAction("remove", 103)))
    assert(o3.displayName == "All Journals")
    assert(matrix(o3) == Seq(-1L -> false, 101L -> false, 102L -> false,
      103L -> false, -1L -> false, 1L -> false, 2L -> false, 3L -> false,
      4L -> false, -1L -> false, 5L -> false, 6L -> false))
  }

  test("a stale group action naming a deleted group is ignored") {
    val js = Seq(j(1, "j1", "c1"), j(2, "j2", "c1"))
    val g1 = Group(101, "g1", "c1", Set(2L), 1)
    val o = initOptions(js, Seq(g1), Seq("c1"), Some(Set(1L)),
      Some(GroupAction("add", 999)))
    // like stale journal ids in the previous selection: the selection
    // survives and the unknown toggle does nothing
    assert(o.selected("c1") == Set(1L))
    assert(o.displayName == "g1")
  }

  test("single group, multi company: group and journal toggles interleave (reference :343-447)") {
    val js = Seq(j(1, "j1", "c1"), j(2, "j2", "c1"),
      j(3, "j3", "c2"), j(4, "j4", "c2"))
    val g1 = Group(101, "g1", "c1", Set(2L), 1)
    val c = Seq("c1", "c2")
    def sel(o: Options) = Some(o.selected.values.flatten.toSet)

    // first load: c1 defaults to g1, c2 (groupless) selects everything
    val o0 = initOptions(js, Seq(g1), c, None)
    assert(o0.displayName == "g1, j3, j4")
    assert(matrix(o0) == Seq(-1L -> false, 101L -> true, -1L -> false,
      1L -> true, 2L -> false, -1L -> false, 3L -> true, 4L -> true))

    // remove g1 → c1 keeps everything (c2 selected) → ALL full → collapse
    val o1 = initOptions(js, Seq(g1), c, sel(o0), Some(GroupAction("remove", 101)))
    assert(o1.displayName == "All Journals")
    assert(matrix(o1) == Seq(-1L -> false, 101L -> false, -1L -> false,
      1L -> false, 2L -> false, -1L -> false, 3L -> false, 4L -> false))

    // check j3
    val o2 = initOptions(js, Seq(g1), c, Some(Set(3L)))
    assert(o2.displayName == "j3")
    assert(matrix(o2) == Seq(-1L -> false, 101L -> false, -1L -> false,
      1L -> false, 2L -> false, -1L -> false, 3L -> true, 4L -> false))

    // check g1 on top
    val o3 = initOptions(js, Seq(g1), c, sel(o2), Some(GroupAction("add", 101)))
    assert(o3.displayName == "g1, j3")
    assert(matrix(o3) == Seq(-1L -> false, 101L -> true, -1L -> false,
      1L -> true, 2L -> false, -1L -> false, 3L -> true, 4L -> false))

    // uncheck j3
    val o4 = initOptions(js, Seq(g1), c, Some(Set(1L)))
    assert(o4.displayName == "g1")
    assert(matrix(o4) == Seq(-1L -> false, 101L -> true, -1L -> false,
      1L -> true, 2L -> false, -1L -> false, 3L -> false, 4L -> false))

    // uncheck g1: nothing selected elsewhere → clear
    val o5 = initOptions(js, Seq(g1), c, sel(o4), Some(GroupAction("remove", 101)))
    assert(o5.displayName == "All Journals")
    assert(matrix(o5) == Seq(-1L -> false, 101L -> false, -1L -> false,
      1L -> false, 2L -> false, -1L -> false, 3L -> false, 4L -> false))

    // check j1, j2: both of c1 selected, c2 empty → names spell the codes
    val o6 = initOptions(js, Seq(g1), c, Some(Set(1L, 2L)))
    assert(o6.displayName == "j1, j2")
    assert(matrix(o6) == Seq(-1L -> false, 101L -> false, -1L -> false,
      1L -> true, 2L -> true, -1L -> false, 3L -> false, 4L -> false))
  }

  test("scan composition: selected ids follow the rows, empty selection means all (reference :322-341)") {
    val js = Seq(j(1, "j1", "c1"), j(2, "j2", "c1"), j(3, "j3", "c2"))
    // explicit selection → only the selected rows' ids
    val o1 = initOptions(js, Nil, Seq("c1", "c2"), Some(Set(1L, 3L)))
    assert(JournalFilter.selectedJournalIds(o1).sorted == Seq(1L, 3L))
    // all-selected collapses the selection → falls back to EVERY journal
    val o2 = initOptions(js, Nil, Seq("c1", "c2"), Some(Set(1L, 2L, 3L)))
    assert(JournalFilter.selectedJournalIds(o2).sorted == Seq(1L, 2L, 3L))
    // no journals at all → no predicate
    val o3 = initOptions(Nil, Nil, Seq("c1"), None)
    assert(JournalFilter.scanPredicate(o3,
      org.apache.spark.sql.functions.col("x")).isEmpty)
  }

  test("q175 gate fixture resolves to {1,3,4,5,7} — the oracle SQL's literal id list") {
    // MUST stay in sync with ReportOps.q175 / q175Sql: first-load default
    // picks each company's first group; exclusions drop journals 2 and 6.
    val js = Seq(j(1, "Bank", "c1"), j(2, "Purchases", "c1"),
      j(3, "Sales", "c1"), j(4, "Cash", "c1"),
      j(5, "Misc", "c2"), j(6, "Exchange", "c2"), j(7, "Opening", "c2"))
    val gs = Seq(Group(101, "c1 operating", "c1", Set(2L), 1),
      Group(102, "c2 ledgers", "c2", Set(6L), 1))
    val o = initOptions(js, gs, Seq("c1", "c2"), None)
    assert(JournalFilter.selectedJournalIds(o).sorted == Seq(1L, 3L, 4L, 5L, 7L))
  }
}
