package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import graft.engine.{AggregationEvaluator, Domain}

/** ScalaCheck properties for the two plan-time DSLs (SURVEY §5 suggests
  * property tests the reference lacks): the aggregation formula evaluator
  * against a naive direct interpreter, and the domain parser as a
  * serialization round-trip. */
object DslProps extends Properties("graft.dsl") {

  // ---- aggregation formulas vs a naive interpreter ---------------------

  private sealed trait T
  private case class N(v: Int) extends T
  private case class L(name: String) extends T
  private case class B(op: Char, l: T, r: T) extends T

  private val leafNames = Vector("A.bal", "B.bal", "C.bal")

  private def genT(depth: Int): Gen[T] =
    if (depth <= 0) Gen.oneOf(Gen.choose(-9, 9).map(N),
      Gen.oneOf(leafNames).map(L))
    else Gen.frequency(
      2 -> Gen.choose(-9, 9).map(N),
      2 -> Gen.oneOf(leafNames).map(L),
      3 -> (for {
        op <- Gen.oneOf('+', '-', '*', '/')
        l <- genT(depth - 1); r <- genT(depth - 1)
      } yield B(op, l, r)))

  private def render(t: T): String = t match {
    case N(v) => if (v < 0) s"(0 - ${-v})" else v.toString
    case L(n) => n
    case B(op, l, r) => s"(${render(l)} $op ${render(r)})"
  }

  /** Reference semantics (account_report.py:2371-2375): a zero denominator
    * anywhere zeroes the WHOLE formula, not just the division node. */
  private object DivZero extends RuntimeException
  private def directRaw(t: T, env: Map[String, Double]): Double = t match {
    case N(v) => v.toDouble
    case L(n) => env(n)
    case B('+', l, r) => directRaw(l, env) + directRaw(r, env)
    case B('-', l, r) => directRaw(l, env) - directRaw(r, env)
    case B('*', l, r) => directRaw(l, env) * directRaw(r, env)
    case B('/', l, r) =>
      val d = directRaw(r, env)
      if (d == 0.0) throw DivZero else directRaw(l, env) / d
    case B(op, _, _) => sys.error(s"op $op")
  }
  private def direct(t: T, env: Map[String, Double]): Double =
    try directRaw(t, env) catch { case DivZero => 0.0 }

  property("evaluator matches a naive interpreter on random formulas") =
    Prop.forAll(genT(4), Gen.choose(-50, 50), Gen.choose(-50, 50),
      Gen.choose(-50, 50)) { (t, a, b, c) =>
      val env = Map("A.bal" -> a.toDouble, "B.bal" -> b.toDouble, "C.bal" -> c.toDouble)
      val out = AggregationEvaluator.evaluate(
        Map("X.bal" -> AggregationEvaluator.Expr(render(t))), env)
      val expect = direct(t, env)
      val got = out("X.bal")
      (got == expect || (got.isNaN && expect.isNaN)) :| s"${render(t)} -> $got vs $expect"
    }

  /** Div-by-zero is caught PER formula, so a referenced line that zeroed out
    * contributes 0 to its referrer — chaining is NOT the same as inlining
    * when the inner formula divides by zero (reference evaluates each
    * expression's formula under its own ZeroDivisionError handler). */
  property("references see the referenced formula's caught value") =
    Prop.forAll(genT(3), Gen.choose(-20, 20)) { (t, a) =>
      val env = Map("A.bal" -> a.toDouble, "B.bal" -> 2.0, "C.bal" -> 3.0)
      val viaChain = AggregationEvaluator.evaluate(
        Map("M.bal" -> AggregationEvaluator.Expr(render(t)),
          "Y.bal" -> AggregationEvaluator.Expr("M.bal + 1")), env)("Y.bal")
      val expect = direct(t, env) + 1.0
      (viaChain == expect ||
        (viaChain.isNaN && expect.isNaN)) :| s"${render(t)} -> $viaChain vs $expect"
    }

  // ---- domain polish-notation round-trip -------------------------------

  private def genDomain(depth: Int): Gen[Domain.Node] =
    if (depth <= 0)
      for {
        f <- Gen.oneOf("state", "amount", "partner_id")
        op <- Gen.oneOf("=", "!=", "<", ">", "<=", ">=")
        v <- Gen.choose(0, 99)
      } yield Domain.Cond(f, op, v)
    else Gen.frequency(
      3 -> genDomain(0),
      2 -> (for { l <- genDomain(depth - 1); r <- genDomain(depth - 1) }
        yield Domain.And(l, r)),
      2 -> (for { l <- genDomain(depth - 1); r <- genDomain(depth - 1) }
        yield Domain.Or(l, r)),
      1 -> genDomain(depth - 1).map(Domain.Not))

  private def toPolish(n: Domain.Node): List[Any] = n match {
    case Domain.Cond(f, op, v) => List((f, op, v))
    case Domain.And(l, r) => "&" :: (toPolish(l) ++ toPolish(r))
    case Domain.Or(l, r) => "|" :: (toPolish(l) ++ toPolish(r))
    case Domain.Not(x) => "!" :: toPolish(x)
    case Domain.TrueLeaf => Nil
  }

  property("domain parse inverts polish serialization") =
    Prop.forAll(genDomain(4)) { n =>
      (Domain.parse(toPolish(n)) == n) :| n.toString
    }

  // ---- integer kernels of the selection operators ----------------------

  /** The q149/q150 systematic-PPS slot rule is pure integer arithmetic;
    * the telescoping sum must allocate EXACTLY K slots for any positive
    * weight sequence (the SelectionOpsSpec pins the same invariant on the
    * fixture; this pins it on adversarial weights — huge heads, singleton
    * shards, K larger than the shard). */
  property("systematic PPS slots telescope to exactly K, never negative") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 1000000L)),
      Gen.choose(1L, 64L)) { (ws, k) =>
      val cums = ws.scanLeft(0L)(_ + _).tail
      val total = cums.last
      val slots = ws.zip(cums).map { case (w, c) =>
        k * c / total - k * (c - w) / total
      }
      (slots.sum == k && slots.forall(_ >= 0)) :| s"k=$k ws=${ws.take(8)}"
    }

  /** Bloom double-hashing: any Long hash (negative included) must land
    * every probe in [0, m) with a nonzero stride. */
  property("bloom positions stay in range with nonzero stride for any hash") =
    Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.choose(2L, 1 << 20), Gen.choose(1, 8)) { (h, m, k) =>
      val ps = graft.streaming.BloomStream.positions(h, m, k)
      ps.forall(p => p >= 0 && p < m) :| s"h=$h m=$m ps=$ps"
    }

  /** The q169 histogram identity (r10): over ANY signature multiset,
    * ΣC(n_v,2) counts the Hamming-0 pairs and Σ_bits n_v·n_{v⊕bit} over
    * v < v⊕bit counts the Hamming-1 pairs exactly — each unordered pair
    * once, because exactly one bit differs. The OperatorsSpec fixture
    * pins Spark-vs-Spark on real data; this pins the MATH on adversarial
    * multisets (heavy collisions, isolated values, empty neighbor sets).
    * 8-bit space keeps brute force cheap; the identity is
    * bit-width-independent (the gate uses 16). */
  property("simhash histogram closed form counts hamming<=1 pairs exactly") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 255L))) { sigs =>
      val bits = 8
      val hist = sigs.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val d0 = hist.values.map(n => n * (n - 1) / 2).sum
      val d1 = (for {
        (v, n) <- hist.toSeq
        b <- 0 until bits
        v2 = v ^ (1L << b) if v < v2
        n2 <- hist.get(v2)
      } yield n * n2).sum
      val idx = sigs.zipWithIndex
      val brute = (for {
        (a, i) <- idx; (c, j) <- idx if i < j
        d = java.lang.Long.bitCount(a ^ c) if d <= 1
      } yield d.toLong).groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
      (d0 == brute.getOrElse(0L, 0L) && d1 == brute.getOrElse(1L, 0L)) :|
        s"closed d0=$d0 d1=$d1 brute=$brute n=${sigs.size}"
    }
}
