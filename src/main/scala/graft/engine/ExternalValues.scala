package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's `external` formula engine + carryover persistence
  * (account_reports/models/account_report.py:2866-2943, carryover
  * :2971-3057): manually-entered or carried-over cell values stored per
  * (expression, date), aggregated as `sum` or `most_recent` within the
  * period, and re-persisted for the next period.
  *
  * Storage is a small parquet "external values" table (expression_id,
  * value, date) — appended per period, read with a date filter. */
object ExternalValues {

  /** `sum` mode: total per expression within [from, to]. */
  def sumMode(ext: DataFrame, from: String, to: String): DataFrame =
    ext.filter(col("date") >= from && col("date") <= to)
      .groupBy(col("expression_id"))
      .agg(sum(col("value")).as("value"))

  /** `most_recent` mode: the SUM of all values at the latest date per
    * expression within the period (account_report.py:2907-2912 —
    * `GROUP BY date ORDER BY date DESC LIMIT 1` around SUM(value); several
    * same-dated values, e.g. a tax unit's per-company carryovers, net). */
  def mostRecent(ext: DataFrame, from: String, to: String): DataFrame = {
    val w = Window.partitionBy(col("expression_id")).orderBy(col("date").desc)
    ext.filter(col("date") >= from && col("date") <= to)
      .groupBy(col("expression_id"), col("date"))
      .agg(sum(col("value")).as("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("expression_id"), col("value"))
  }

  /** Carryover: persist computed totals as next period's external values
    * (reference `_carryover_*` expressions). Append-only by design. */
  def carryover(spark: SparkSession, totals: Map[String, Double],
                asOfDate: String, path: String): Unit = {
    import spark.implicits._
    totals.toSeq.toDF("expression_id", "value")
      .withColumn("date", lit(asOfDate))
      .withColumn("value_id", monotonically_increasing_id())
      .write.mode("append").parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
