package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingestion (SURVEY §2.1 S4 family): the reference accepts
  * JSON payloads on several import endpoints (etl_base controllers parse
  * uploaded JSON bodies row-wise). Spark-first: a schema-enforced JSONL
  * scan with explicit bad-record policy, then a normal write — the same
  * source-not-row-loop shape as [[CsvSource]].
  *
  * Scale: `spark.read.json` on line-delimited files is splittable;
  * PERMISSIVE mode + a corrupt-record column keeps malformed lines
  * observable instead of dropped. */
object JsonSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)

  /** Ingest: read, split valid/corrupt, land valid rows as parquet.
    * Returns (validCount, corruptCount). */
  def ingest(spark: SparkSession, src: String, schema: StructType,
             dest: String): (Long, Long) = {
    val df = read(spark, src, schema).cache()
    try {
      val corrupt = df.filter(df.col("_corrupt_record").isNotNull).count()
      val valid = df.filter(df.col("_corrupt_record").isNull)
        .drop("_corrupt_record")
      valid.write.mode("overwrite").parquet(dest)
      (valid.count(), corrupt)
    } finally df.unpersist()
  }
}
