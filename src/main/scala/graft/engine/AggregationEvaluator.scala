package graft.engine

/** The reference's `aggregation` formula engine
  * (account_reports/models/account_report.py:2279-2498): report cells whose
  * formula is arithmetic over other lines' labels (`LINE1.balance +
  * LINE2.balance`), resolved by iterative term substitution until the
  * formula is pure arithmetic, with division-by-zero evaluating to 0 and
  * optional bound subformulas (`if_above(CUR(n))`, `if_below`, `if_between`,
  * `round(n)`).
  *
  * Driver-side by design (SURVEY §2.5, §7.3): the input is the *small* map
  * of already-aggregated engine totals, never row data — at 100 TB this
  * stays a few-KB computation on the driver after the distributed
  * aggregations have collapsed each term to one number.
  */
object AggregationEvaluator {

  sealed trait Bound
  final case class IfAbove(v: Double) extends Bound
  final case class IfBelow(v: Double) extends Bound
  final case class IfBetween(lo: Double, hi: Double) extends Bound
  final case class RoundTo(n: Int) extends Bound
  /** Gate on ANOTHER expression's value (reference `if_other_expr_above/
    * below`, account_report.py:2421-2498): keep this expression's value
    * only when `other`'s resolved value clears the threshold. */
  final case class IfOtherAbove(other: String, v: Double) extends Bound
  final case class IfOtherBelow(other: String, v: Double) extends Bound

  /** `crossLeaves` is the cross_report namespace (account_report.py:
    * 2279-2419): term values computed from ANOTHER report under this
    * expression's forced date scope. They are consulted FIRST when
    * resolving THIS formula's terms (the reference merges
    * `{**current_report_eval_dict, **other_reports_eval_dict[scope]}`, so
    * the other report's codes shadow same-named local ones) and are scoped
    * to this expression only — nested local references resolve normally. */
  final case class Expr(formula: String, bounds: Seq[Bound] = Nil,
                        crossLeaves: Map[String, Double] = Map.empty)

  /** Control-flow signal for the reference's formula-wide ZeroDivisionError
    * semantics; never escapes [[evaluate]]. */
  private object DivByZero extends RuntimeException("division by zero") {
    override def fillInStackTrace(): Throwable = this
  }

  /** Parse a subformula string like "if_above(USD(1000))" / "round(2)" /
    * "if_other_expr_above(LINE.bal, USD(3))". A threshold written in a
    * currency present in `rates` (units of that currency per company
    * currency unit, e.g. GOL -> 2.0) is converted into company currency —
    * the reference resolves CUR(...) through the currency table at the
    * report date (account_report.py:2421-2498); unknown codes rate 1.0
    * (the company currency itself). */
  def parseBound(s: String, rates: Map[String, Double] = Map.empty): Bound = {
    def conv(cur: String, v: String): Double = v.toDouble / rates.getOrElse(cur, 1.0)
    val cur = """(\w+)\((\w{3})\(([-\d.]+)\)\)""".r
    val rnd = """round\((\d+)\)""".r
    val btw = """if_between\((\w{3})\(([-\d.]+)\),(\w{3})\(([-\d.]+)\)\)""".r
    val oth = """(if_other_expr_above|if_other_expr_below)\(([\w.]+),(\w{3})\(([-\d.]+)\)\)""".r
    s.replaceAll("\\s", "") match {
      case rnd(n) => RoundTo(n.toInt)
      case btw(cLo, lo, cHi, hi) => IfBetween(conv(cLo, lo), conv(cHi, hi))
      case cur("if_above", c, v) => IfAbove(conv(c, v))
      case cur("if_below", c, v) => IfBelow(conv(c, v))
      case oth("if_other_expr_above", code, c, v) => IfOtherAbove(code, conv(c, v))
      case oth("if_other_expr_below", code, c, v) => IfOtherBelow(code, conv(c, v))
      case other => throw new IllegalArgumentException(s"bad subformula: $other")
    }
  }

  // ---- tiny recursive-descent parser for + - * / ( ) terms & numbers ----

  private sealed trait Ast
  private case class Num(v: Double) extends Ast
  private case class Term(code: String) extends Ast // "LINE.balance"
  private case class Bin(op: Char, l: Ast, r: Ast) extends Ast
  private case class Neg(x: Ast) extends Ast

  /** Token order matters: exponent literals first (`1.752e-17` must not
    * split into `1.752`, term `e`, `-17`), then plain floats, then terms —
    * which may be DIGIT-LED, like the reference's line code `9999` in
    * `9999.account_codes` (test_report_engines.py test5) — then integers
    * and operators. A token is a term iff it contains a letter or
    * underscore. */
  private def tokenize(s: String): List[String] = {
    val re = """\d+(?:\.\d+)?[eE][+-]?\d+|\d+\.\d+|[A-Za-z_\d.]*[A-Za-z_][A-Za-z_\d.]*|\d+|[()+\-*/]""".r
    val tokens = re.findAllIn(s).toList
    // findAllIn silently SKIPS characters no alternative matches (a
    // stray '.' in "1.2.3" would tokenize as 1.2 and 3 and evaluate to a
    // wrong value); the reference raises for malformed formulas instead,
    // so require the tokens to reconstruct the whitespace-free input
    require(tokens.mkString == s.replaceAll("\\s", ""),
      s"malformed formula: $s")
    tokens
  }

  private def parseAst(tokens: List[String]): Ast = {
    var rest = tokens
    def peek: Option[String] = rest.headOption
    def eat(): String = { val h = rest.head; rest = rest.tail; h }
    def atom(): Ast = eat() match {
      case "(" => val e = expr(); require(eat() == ")", "unbalanced parens"); e
      case "-" => Neg(atom())
      case "+" => atom()
      // digit-led tokens can be TERMS ("9999.account_codes"), so classify
      // by parseability, not the first character
      case t => t.toDoubleOption.map(Num.apply).getOrElse(Term(t))
    }
    def term(): Ast = {
      var l = atom()
      while (peek.contains("*") || peek.contains("/")) { val op = eat()(0); l = Bin(op, l, atom()) }
      l
    }
    def expr(): Ast = {
      var l = term()
      while (peek.contains("+") || peek.contains("-")) { val op = eat()(0); l = Bin(op, l, term()) }
      l
    }
    val e = expr()
    require(rest.isEmpty, s"trailing tokens: $rest")
    e
  }

  /** Evaluate every expression. `leaves` are terms already computed by the
    * other engines; `exprs` may reference each other (forward references
    * allowed). Cycles raise; 0-division yields 0 (reference
    * `ZeroDivisionError → 0`, :2371-2383). Bounds apply AFTER the referenced
    * value is computed and are not inlined into referencing formulas
    * (reference evaluates bounds per-expression, :2421-2498). */
  def evaluate(exprs: Map[String, Expr], leaves: Map[String, Double]): Map[String, Double] = {
    val memoRaw = scala.collection.mutable.Map[String, Double]() // pre-bound values
    val memoFinal = scala.collection.mutable.Map[String, Double]() // bounded values
    val visiting = scala.collection.mutable.Set[String]()
    val visitingBounds = scala.collection.mutable.Set[String]()

    // bound comparisons are at CURRENCY precision (the reference compares
    // via currency.compare_amounts, which rounds both sides to the
    // currency's 2 decimals first — if_above(USD(1999.9999999)) does NOT
    // pass a value of 2000.0, test_report_engines.py test2_2)
    def cmp(a: Double, b: Double): Int =
      BigDecimal(a).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .compare(BigDecimal(b).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    def applyBounds(v: Double, bounds: Seq[Bound]): Double =
      bounds.foldLeft(v) { (x, b) =>
        b match {
          case IfAbove(t) => if (cmp(x, t) > 0) x else 0.0
          case IfBelow(t) => if (cmp(x, t) < 0) x else 0.0
          case IfBetween(lo, hi) => if (cmp(x, lo) >= 0 && cmp(x, hi) <= 0) x else 0.0
          case IfOtherAbove(o, t) => if (cmp(valueOf(o), t) > 0) x else 0.0
          case IfOtherBelow(o, t) => if (cmp(valueOf(o), t) < 0) x else 0.0
          case RoundTo(n) =>
            // Python round() is banker's rounding (half-to-even): the
            // reference's round(2.5) subformula yields 2, not 3. (Python
            // actually rounds the shortest-repr decimal of the float; for
            // the 2-decimal money values seen here HALF_EVEN on BigDecimal
            // matches.)
            BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        }
      }

    // referencing another aggregation line sees its BOUNDED value
    def valueOf(code: String): Double =
      leaves.getOrElse(code, memoFinal.getOrElseUpdate(code, {
        val e = exprs.getOrElse(code,
          throw new NoSuchElementException(s"unknown term: $code"))
        if (visitingBounds(code))
          throw new IllegalStateException(s"bound cycle at $code")
        visitingBounds += code
        val v = applyBounds(raw(code, e), e.bounds)
        visitingBounds -= code
        v
      }))

    def raw(code: String, e: Expr): Double = memoRaw.getOrElseUpdate(code, {
      if (visiting(code)) throw new IllegalStateException(s"cycle at $code")
      visiting += code
      // The reference wraps the WHOLE formula eval in a ZeroDivisionError
      // handler (account_report.py:2371-2375): any zero denominator zeroes
      // the entire expression — 'A + B/C' with C=0 is 0, not A.
      val v = try eval(parseAst(tokenize(e.formula)), e.crossLeaves)
              catch { case DivByZero => 0.0 }
      visiting -= code
      v
    })

    def eval(a: Ast, env: Map[String, Double]): Double = a match {
      case Num(v) => v
      case Neg(x) => -eval(x, env)
      case Term(c) => env.getOrElse(c, valueOf(c))
      case Bin('+', l, r) => eval(l, env) + eval(r, env)
      case Bin('-', l, r) => eval(l, env) - eval(r, env)
      case Bin('*', l, r) => eval(l, env) * eval(r, env)
      case Bin('/', l, r) =>
        val d = eval(r, env); if (d == 0.0) throw DivByZero else eval(l, env) / d
      case Bin(op, _, _) => throw new IllegalStateException(s"op $op")
    }

    exprs.map { case (code, _) => code -> valueOf(code) }
  }
}
