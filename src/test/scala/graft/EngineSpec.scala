package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._
import graft.report.LineTree

/** Pure-Scala engine-layer specs (no SparkSession needed): aggregation
  * fixpoint evaluator, account-codes DSL parser, date scopes, line tree.
  * Golden values mirror the reference's documented examples
  * (account_report.py:2279-2498, :622-654, :3449-3476). */
class EngineSpec extends AnyFunSuite {

  import AggregationEvaluator._

  test("aggregation: forward references resolve in any order") {
    val out = evaluate(
      Map("A.b" -> Expr("B.b + 1"), "B.b" -> Expr("C.b * 2"), "C.b" -> Expr("X.b - 3")),
      Map("X.b" -> 10.0))
    assert(out("C.b") == 7.0 && out("B.b") == 14.0 && out("A.b") == 15.0)
  }

  test("aggregation: division by zero yields 0 (reference ZeroDivisionError→0)") {
    val out = evaluate(Map("R.b" -> Expr("X.b / (X.b - X.b)")), Map("X.b" -> 5.0))
    assert(out("R.b") == 0.0)
  }

  test("aggregation: zero denominator zeroes the WHOLE formula, not just the node") {
    // reference catches ZeroDivisionError around the whole eval
    // (account_report.py:2371-2375): 'A + B/C' with C=0 is 0, not A
    val out = evaluate(Map("R.b" -> Expr("A.b + B.b / C.b")),
      Map("A.b" -> 7.0, "B.b" -> 3.0, "C.b" -> 0.0))
    assert(out("R.b") == 0.0)
  }

  test("aggregation: round() is banker's rounding like Python round()") {
    val out = evaluate(Map(
      "A.b" -> Expr("X.b", Seq(RoundTo(0))),       // round(2.5) -> 2
      "B.b" -> Expr("X.b + 1", Seq(RoundTo(0)))),  // round(3.5) -> 4
      Map("X.b" -> 2.5))
    assert(out("A.b") == 2.0 && out("B.b") == 4.0)
  }

  test("aggregation: cycles are detected") {
    assertThrows[IllegalStateException] {
      evaluate(Map("A.b" -> Expr("B.b"), "B.b" -> Expr("A.b")), Map.empty)
    }
  }

  test("aggregation: bounds gate the final value; references see bounded value") {
    val exprs = Map(
      "A.b" -> Expr("X.b", Seq(IfAbove(100.0))), // 50 -> gated to 0
      "B.b" -> Expr("A.b + 1"))                  // sees the bounded 0
    val out = evaluate(exprs, Map("X.b" -> 50.0))
    assert(out("A.b") == 0.0 && out("B.b") == 1.0)
  }

  test("aggregation: if_between, if_below, round") {
    assert(parseBound("if_above(USD(1000))") == IfAbove(1000.0))
    assert(parseBound("if_between(USD(0), USD(10))") == IfBetween(0.0, 10.0))
    assert(parseBound("round(2)") == RoundTo(2))
    val out = evaluate(Map(
      "A.b" -> Expr("X.b", Seq(IfBetween(0.0, 10.0))),
      "B.b" -> Expr("X.b / 3", Seq(RoundTo(2))),
      "C.b" -> Expr("0 - X.b", Seq(IfBelow(0.0)))), Map("X.b" -> 5.0))
    assert(out("A.b") == 5.0 && out("B.b") == 1.67 && out("C.b") == -5.0)
  }

  test("aggregation: if_other_expr bounds gate on another line's value") {
    assert(parseBound("if_other_expr_above(T.bal, USD(3))") == IfOtherAbove("T.bal", 3.0))
    assert(parseBound("if_other_expr_below(T.bal, USD(3))") == IfOtherBelow("T.bal", 3.0))
    val out = evaluate(Map(
      "T.bal" -> Expr("X.b * 2"),
      "A.b" -> Expr("X.b + 1", Seq(IfOtherAbove("T.bal", 3.0))),  // 10>3: keep
      "B.b" -> Expr("X.b + 1", Seq(IfOtherBelow("T.bal", 3.0)))), // gate to 0
      Map("X.b" -> 5.0))
    assert(out("A.b") == 6.0 && out("B.b") == 0.0)
    // mutual bound references are cycles, not infinite loops
    assertThrows[IllegalStateException] {
      evaluate(Map(
        "P.b" -> Expr("1", Seq(IfOtherAbove("Q.b", 0.0))),
        "Q.b" -> Expr("1", Seq(IfOtherAbove("P.b", 0.0)))), Map.empty)
    }
  }

  test("aggregation: precedence and parens") {
    val out = evaluate(Map("A.b" -> Expr("2 + 3 * 4"), "B.b" -> Expr("(2 + 3) * 4"),
      "C.b" -> Expr("-X.b + 1")), Map("X.b" -> 10.0))
    assert(out("A.b") == 14.0 && out("B.b") == 20.0 && out("C.b") == -9.0)
  }

  test("aggregation: a malformed formula raises instead of silently dropping characters") {
    // r13 ADVICE: findAllIn skips unmatched characters — '1.2.3' used to
    // tokenize as (1.2, 3) and evaluate to a wrong value; the reference
    // raises a UserError for formulas its grammar cannot read
    intercept[IllegalArgumentException] {
      evaluate(Map("A.b" -> Expr("1.2.3 + X.b")), Map("X.b" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      evaluate(Map("A.b" -> Expr("X.b ; drop")), Map("X.b" -> 1.0))
    }
    // whitespace is still free between tokens
    assert(evaluate(Map("A.b" -> Expr("  1.5  +  X.b ")),
      Map("X.b" -> 0.5))("A.b") == 2.0)
  }

  test("aggregation: property — linear formulas match direct arithmetic") {
    val gen = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val (x, y) = (gen.nextInt(20001) - 10000, gen.nextInt(20001) - 10000)
      val out = evaluate(Map("S.b" -> Expr("X.b + Y.b"), "D.b" -> Expr("X.b - Y.b")),
        Map("X.b" -> x.toDouble, "Y.b" -> y.toDouble))
      assert(out("S.b") == x.toDouble + y.toDouble)
      assert(out("D.b") == x.toDouble - y.toDouble)
    }
  }

  test("account_codes: DSL parse follows the reference term regex") {
    // the reference grammar (account_report.py:31-38): the char before
    // '\(' belongs to the PREFIX; a balance gate goes after the exclusion
    // group — so a D-gated 123 excluding subprefixes is written
    // '123\(1234,1236)D', while '123D\(...)' targets accounts literally
    // prefixed "123D"
    assert(AccountCodes.parse("123\\(1234,1236)D + 56 - 416C") == Seq(
      AccountCodes.Term("123", 1, Some('D'), Seq("1234", "1236")),
      AccountCodes.Term("56", 1, None, Nil),
      AccountCodes.Term("416", -1, Some('C'), Nil)))
    assert(AccountCodes.parse("123D\\(1234)") == Seq(
      AccountCodes.Term("123D", 1, None, Seq("1234"))))
    // the empty-exclusion disambiguator for codes ending in C/D
    // (test_report_engines.py:417-424 '345D\()D' / '345D\()C')
    assert(AccountCodes.parse("345D\\()D") == Seq(
      AccountCodes.Term("345D", 1, Some('D'), Nil)))
    // dotted prefixes ('10.' / '10.20', test_report_engines.py:404-411)
    assert(AccountCodes.parse("10.20 - 101 + 101002") == Seq(
      AccountCodes.Term("10.20", 1, None, Nil),
      AccountCodes.Term("101", -1, None, Nil),
      AccountCodes.Term("101002", 1, None, Nil)))
    intercept[IllegalArgumentException](AccountCodes.parse("1*2"))
  }

  test("date scopes: fiscal-year boundaries (June-30 year end)") {
    val fc = DateScope.FiscalConfig(6, 30)
    assert(DateScope.fiscalYearStart(LocalDate.of(1996, 3, 15), fc) == LocalDate.of(1995, 7, 1))
    assert(DateScope.fiscalYearStart(LocalDate.of(1996, 7, 1), fc) == LocalDate.of(1996, 7, 1))
    assert(DateScope.fiscalYearStart(LocalDate.of(1996, 6, 30), fc) == LocalDate.of(1995, 7, 1))
    // calendar year end
    val cal = DateScope.FiscalConfig()
    assert(DateScope.fiscalYearStart(LocalDate.of(2024, 5, 5), cal) == LocalDate.of(2024, 1, 1))
  }

  test("domain: parse implicit-AND and explicit operators") {
    import Domain._
    val n = parse(Seq(("a", "=", 1), ("b", ">", 2)))
    assert(n == And(Cond("a", "=", 1), Cond("b", ">", 2)))
    val n2 = parse(Seq("|", ("a", "=", 1), "!", ("b", "=", 2)))
    assert(n2 == Or(Cond("a", "=", 1), Not(Cond("b", "=", 2))))
  }

  test("line tree: the reference's documented sort example (:3449-3476)") {
    import LineTree._
    // parent_1 balance=11 with children 1,3,2,7,4 + total;
    // parent_2 balance=10 with children 5,6 + total. Ascending sort.
    val lines = Seq(
      Line("p1", None, "parent_line_1", Seq(11.0)),
      Line("c1", Some("p1"), "child_line_1", Seq(1.0)),
      Line("c2", Some("p1"), "child_line_2", Seq(3.0)),
      Line("c3", Some("p1"), "child_line_3", Seq(2.0)),
      Line("c4", Some("p1"), "child_line_4", Seq(7.0)),
      Line("c5", Some("p1"), "child_line_5", Seq(4.0)),
      Line("c6", Some("p1"), "child_line_6", Seq(0.0), isTotal = true),
      Line("p2", None, "parent_line_2", Seq(10.0)),
      Line("c7", Some("p2"), "child_line_7", Seq(5.0)),
      Line("c8", Some("p2"), "child_line_8", Seq(6.0)),
      Line("c9", Some("p2"), "child_line_9", Seq(0.0), isTotal = true))
    val sorted = sortTree(build(lines), 0, desc = false)
    assert(flatten(sorted).map(_._2.id) ==
      Seq("p2", "c7", "c8", "c9", "p1", "c1", "c3", "c2", "c5", "c4", "c6"))
  }

  test("line tree: rollup, totals pinned, hide-if-zero") {
    import LineTree._
    val lines = Seq(
      Line("r", None, "root", Seq(0.0)),
      Line("a", Some("r"), "alpha", Seq(5.0)),
      Line("b", Some("r"), "beta", Seq(7.0)),
      Line("t", Some("r"), "total", Seq(0.0), isTotal = true),
      Line("z", Some("r"), "zero", Seq(0.0)))
    val roots = build(lines)
    assert(roots.head.rollup == Seq(12.0))
    val sorted = sortTree(roots, 0, desc = true)
    assert(sorted.head.children.map(_.line.id) == Seq("b", "a", "z", "t"))
    val pruned = hideZero(sortTree(roots, 0, desc = false))
    assert(flatten(pruned).map(_._2.id) == Seq("r", "a", "b", "t"))
  }
}
