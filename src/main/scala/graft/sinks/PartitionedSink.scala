package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet sink + retention (SURVEY §2.10: the reference's
  * auditlog autovacuum deletes log rows older than N days in chunks,
  * auditlog/models/autovacuum.py:16-37). Spark-first: the changelog lands
  * partitioned by day, so retention is DROPPING WHOLE PARTITION DIRECTORIES
  * — an O(partitions) metadata operation instead of a chunked DELETE scan,
  * and readers prune to the partitions they query. */
object PartitionedSink {

  /** Append `df` partitioned by the date of `tsCol` (day granularity). */
  def appendByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("append")
      .partitionBy("p_date")
      .parquet(path)

  /** Retention vacuum: drop partitions strictly older than `cutoff`
    * (yyyy-MM-dd). Returns the dropped partition names. */
  def dropOlderThan(spark: SparkSession, path: String, cutoff: String): Seq[String] = {
    val root = new java.io.File(path)
    val dropped = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("p_date="))
      .filter(_.getName.stripPrefix("p_date=") < cutoff)
    dropped.foreach(dir => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    })
    dropped.map(_.getName).toSeq.sorted
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
