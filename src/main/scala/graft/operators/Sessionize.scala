package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gaps-and-islands over an event stream: a new
  * session starts when the gap since the user's previous event exceeds
  * `gapSec`. This is the BATCH TWIN of the streaming state sessionizer
  * ([[graft.streaming.EventsStream]]'s mapGroupsWithState path): same
  * semantics, replayable over history, and oracle-checkable (the streaming
  * side is spec-tested for agreement with incremental execution).
  *
  * Scale: one shuffle on the user key; both window functions (lag + running
  * sum) share a single window spec, so Spark evaluates them in one pass per
  * partition. Gap arithmetic is in microseconds via unix_micros — exact
  * integers, no timestamp-truncation ambiguity across engines. */
object Sessionize {

  /** Returns one row per (user, session): session start, event count,
    * duration in microseconds. `idCol` breaks ordering ties between
    * same-timestamp events deterministically. */
  def sessions(events: DataFrame, userCol: Column, tsCol: Column,
               idCol: Column, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val us = unix_micros(tsCol)
    val newSession = when(
      us - lag(us, 1).over(w) > lit(gapSec * 1000000L), 1L).otherwise(0L)
    events
      .withColumn("__us", us)
      .withColumn("__sid", sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(userCol.as("user_id"), col("__sid"))
      .agg(
        date_format(min(tsCol), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("dur_us"))
      .drop("__sid")
  }
}
