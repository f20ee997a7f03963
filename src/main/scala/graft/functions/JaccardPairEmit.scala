package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native posting-list pair emitter for the Jaccard inverted index (r19;
  * VERDICT r18 next-list #3): given one shingle's posting list — the
  * `collect_list(struct(doc_id, n))` of every document carrying that
  * shingle, with its capped set size — emit every unordered candidate
  * pair `(d1 < d2, n1, n2)` that survives the PPJoin-family length bound
  * `n1·lt ≤ n2 ∧ n2·lt ≤ n1`.
  *
  * Why: this replaces the index SELF-JOIN (`shN.as("a") ⋈ shN.as("b") ON
  * a.s = b.s AND a.doc_id < b.doc_id AND length-filter`) with ONE
  * aggregation keyed by the shingle. The join shape shuffles the decorated
  * index TWICE (both sides of the sort-merge/shuffled-hash join, plus the
  * join's sorts or hash build); the posting-list shape shuffles it ONCE
  * into `collect_list` and emits pairs with a tight per-key double loop.
  * The pair mass is identical — bounded by cap² per shingle either way
  * (the df cap is enforced upstream) — and the downstream
  * `groupBy(d1, d2, n1, n2).count()` aggregation is unchanged, so the
  * result is the same multiset of pair rows by construction.
  *
  * Semantics (bit-identical to the join it replaces):
  *   - each unordered pair of distinct docs in the list is emitted at most
  *     once, as (min_id, max_id) with the matching (n1, n2) — upstream
  *     guarantees a doc appears at most once per shingle (per-document
  *     distinct hashing), mirroring `a.doc_id < b.doc_id`;
  *   - the length bound multiplies exactly like the Column form
  *     (`a.n * lt <= b.n`): long → double widening, double multiply,
  *     double compare;
  *   - the list is sorted by doc_id first, so emission order is
  *     deterministic regardless of `collect_list`'s arrival order (the
  *     consumer re-aggregates, so order is not observable anyway).
  *
  * Input: `array<struct<doc_id: long, n: long>>`; output:
  * `array<struct<d1, d2, n1, n2: long>>` (explode then feeds the pair
  * aggregation). The threshold is a plan-time constant, like
  * [[PortableNgramHashExpr]]'s `n`. */
final case class JaccardPairEmitExpr(child: Expression, lt: Double)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
      if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"jaccard_pair_emit expects array<struct<long, long>>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d1", LongType, nullable = false),
    StructField("d2", LongType, nullable = false),
    StructField("n1", LongType, nullable = false),
    StructField("n2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "jaccard_pair_emit"

  override protected def nullSafeEval(input: Any): Any =
    JaccardPairEmitExpr.emit(input.asInstanceOf[ArrayData], lt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${classOf[JaccardPairEmitExpr].getName}$$.MODULE$$.emit($c, $lt)")

  override protected def withNewChildInternal(newChild: Expression): JaccardPairEmitExpr =
    copy(child = newChild)
}

object JaccardPairEmitExpr {

  /** The shared kernel (also called from generated code). */
  def emit(list: ArrayData, lt: Double): ArrayData = {
    val m = list.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](m)
    val ns = new Array[Long](m)
    var i = 0
    while (i < m) {
      val r = list.getStruct(i, 2)
      ids(i) = r.getLong(0)
      ns(i) = r.getLong(1)
      i += 1
    }
    // canonicalize (d1 < d2) and make emission order deterministic:
    // insertion sort by doc_id — lists are cap-bounded (tens of entries)
    i = 1
    while (i < m) {
      val id = ids(i); val n = ns(i)
      var j = i - 1
      while (j >= 0 && ids(j) > id) {
        ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1
      }
      ids(j + 1) = id; ns(j + 1) = n
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](m * (m - 1) / 2)
    i = 0
    while (i < m - 1) {
      val n1 = ns(i)
      val n1d = n1.toDouble
      var j = i + 1
      while (j < m) {
        val n2 = ns(j)
        // exactly the Column form's `a.n * lt <= b.n && b.n * lt <= a.n`
        if (n1d * lt <= n2.toDouble && n2.toDouble * lt <= n1d) {
          val row = new GenericInternalRow(4)
          row.setLong(0, ids(i)); row.setLong(1, ids(j))
          row.setLong(2, n1); row.setLong(3, n2)
          out += row
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object JaccardPairEmit {
  /** Column-API entry point: candidate pairs of one posting list. */
  def of(postings: Column, lt: Double): Column =
    Bridge.column(JaccardPairEmitExpr(Bridge.expression(postings), lt))
}
