package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions, so SQL users
  * get them too:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT vector_dot(a.embedding, b.embedding) FROM ...
  *
  * For an already-running session use [[GraftExtensions.install]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
  }
}

object GraftExtensions {
  private val vectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDotExpr].getName, "vector_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vector_dot takes exactly 2 arguments")
      VectorDotExpr(children.head, children(1))
    })

  /** Imperative registration on an existing session. */
  def install(spark: SparkSession): Unit = {
    val (id, info, builder) = vectorDotDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
