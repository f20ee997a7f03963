package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (build brief's "range join"; the reference's interval/bucket
  * joins, SURVEY §2.3 J6): match points to [lo, hi] intervals WITHOUT the
  * nested-loop plan Spark picks for a bare range predicate.
  *
  * Trick: bucketize the domain with a width >= the max interval length's
  * bucket span; each interval explodes to the few buckets it overlaps, the
  * point maps to exactly one bucket, and the join becomes an EQUI join on
  * the bucket id followed by the exact range filter. Shuffle is
  * hash-partitioned on the bucket — the plan a 100-TB range join needs. */
object RangeJoin {

  /** `points` with numeric column `pCol`; `intervals` with numeric `loCol`
    * <= `hiCol`. Returns matched (point row ⨝ interval row) pairs.
    * `bucketWidth` trades replication (small width → many buckets per
    * interval) against bucket selectivity. */
  def pointInInterval(points: DataFrame, pCol: String, intervals: DataFrame,
                      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pCol)))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }
}
