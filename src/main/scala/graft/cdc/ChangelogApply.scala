package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The write side of CDC (SURVEY §2.10): [[ChangelogDiff]] PRODUCES an
  * auditlog-style changelog; this operator CONSUMES one to maintain a
  * materialized grouped aggregate incrementally — the reference re-reads
  * the whole table after every batch of writes (auditlog `full` mode
  * re-read, `auditlog/models/rule.py:270-487`), which at 100 TB means a
  * full recompute per batch. Sums and counts are abelian, so the
  * changelog's deltas fold into the existing aggregate with one small
  * shuffle over the CHANGED keys only.
  *
  * Contract: `changelog` rows are (`op` ∈ create|write|unlink, key,
  * `old_value`, `new_value`) at the same grain the base aggregate counts
  * (one row per tracked record). create contributes +new/+1, unlink
  * −old/−1, write (new−old)/0. Values must be exact types (integral or
  * decimal) — incremental and recomputed floats would drift apart.
  */
object ChangelogApply {

  /** `base`: materialized (`keyCol`, `total`, `n`). Returns the maintained
    * aggregate after applying `changelog`; keys whose count reaches 0
    * disappear (as a recompute would drop them). */
  def applySums(base: DataFrame, changelog: DataFrame, keyCol: String): DataFrame = {
    val deltas = changelog.groupBy(col(keyCol)).agg(
      sum(when(col("op") === "create", col("new_value"))
        .when(col("op") === "unlink", -col("old_value"))
        .otherwise(col("new_value") - col("old_value"))).as("d_total"),
      sum(when(col("op") === "create", 1L)
        .when(col("op") === "unlink", -1L).otherwise(0L)).as("d_n"))
    base.join(deltas, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("total"), lit(0L)) + coalesce(col("d_total"), lit(0L))).as("total"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"))
      .filter(col("n") > 0)
  }
}
