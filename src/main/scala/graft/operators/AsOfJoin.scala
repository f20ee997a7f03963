package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (build brief: "when the reference has an operator Spark
  * lacks (as-of join, range join, ...)"; the reference's as-of-date stock
  * quantities, etl_stock serial ledger): for each left row, attach the
  * latest right row with rightTs <= leftTs within the same key.
  *
  * Spark-first formulation: NOT a range join (quadratic blow-up per key) —
  * instead union both sides, one window pass per key ordered by
  * (ts, side, tiebreak), and `last(_, ignoreNulls)` carries the most
  * recent right values forward onto each left row. One shuffle on the key,
  * linear work, survives any key cardinality. */
object AsOfJoin {

  /** `key`, `tsCol`, `tiebreak` must exist in BOTH frames; `payload` are
    * the remaining left columns to keep; `rightCols` the right value
    * columns to carry (no name collisions with the kept left columns).
    * Right rows at the same timestamp as a left row DO match (<=). */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           tiebreak: String, payload: Seq[String], rightCols: Seq[String]): DataFrame = {
    val l = left.select(Seq(col(key), col(tsCol), col(tiebreak), lit(1).as("__side")) ++
      payload.map(col) ++
      rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(Seq(col(key), col(tsCol), col(tiebreak), lit(0).as("__side")) ++
      payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rightCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort BEFORE left rows at the same ts (side 0 < 1) so
    // equal-ts rights are visible to the left row (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col("__side"), col(key), col(tsCol), col(tiebreak)) ++
        payload.map(col) ++
        rightCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1).drop("__side")
  }
}
