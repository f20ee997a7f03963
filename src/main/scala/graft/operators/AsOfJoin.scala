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
    * Right rows at the same timestamp as a left row DO match (<=).
    *
    * The right columns are carried as ONE struct with a single
    * `last(_, ignoreNulls)` — carrying each column independently would mix
    * fields of different right rows whenever the latest right row has a
    * NULL in one carried column (that column would fall back to an older
    * row). All carried values always come from the same right row; NULLs
    * in that row stay NULL. */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           tiebreak: String, payload: Seq[String], rightCols: Seq[String]): DataFrame = {
    val rStruct = struct(rightCols.map(col): _*)
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType
    val l = left.select(Seq(col(key), col(tsCol), col(tiebreak), lit(1).as("__side")) ++
      payload.map(col) ++
      Seq(lit(null).cast(rType).as("__r")): _*)
    val r = right.select(Seq(col(key), col(tsCol), col(tiebreak), lit(0).as("__side")) ++
      payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(rStruct.as("__r")): _*)
    // right rows sort BEFORE left rows at the same ts (side 0 < 1) so
    // equal-ts rights are visible to the left row (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(tsCol), col(tiebreak)) ++
        payload.map(col) ++
        rightCols.map(c => col("__r").getField(c).as(c)): _*)
  }
}
