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
  * Null if either side is null; requires equal lengths. A NULL ELEMENT
  * contributes 0.0 to the sum — checked explicitly (isNullAt) in BOTH the
  * interpreted and codegen paths, so parquet's default containsNull=true
  * arrays evaluate identically everywhere (toFloatArray would NPE
  * interpreted while unsafe getFloat silently read 0.0f). */
final case class VectorDotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(),
      s"vector_dot: length mismatch $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
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
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double ${acc}_x = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double ${acc}_y = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
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
