package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-scan column profiler — the ingest-time data-profiling report
  * (per column: row/non-null/distinct counts, min, max) every warehouse
  * runs when a new feed lands, and the statistics layer the reference's
  * upload screens display before committing a batch.
  *
  * Scale posture: ONE pass over the fact. Catalyst plans the multiple
  * count-distincts as a single Expand (one scan, ×columns intermediate
  * rows, map-side partials), which is the exact-distinct trade; at 100 TB
  * swap `countDistinct` for `approx_count_distinct` via `exact = false` —
  * same single scan, HLL-bounded memory, no expand blow-up. min/max are
  * cast to string so heterogeneous column types share one tall report. */
object TableProfile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    def dcount(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"), dcount(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(count(lit(1)).as("__total"), aggs: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__total").cast("long").as("n_rows"),
          col(s"__n_$c").cast("long").as("n_nonnull"),
          col(s"__d_$c").cast("long").as("n_distinct"),
          col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
