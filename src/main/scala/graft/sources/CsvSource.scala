package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion (SURVEY §2.1 S4): the reference parses uploaded CSVs and
  * bulk-writes rows (etl_stock/models/company.py:396-413 `read_csv_file*`,
  * :657-890 `upload_ob_rec`/`upload_vendor_payable`,
  * inventory_updation.py:81-85). Spark-first: a schema-enforced csv scan
  * with explicit bad-row policy, then a normal write — ingestion is just a
  * source, not a row loop.
  *
  * Scale: `spark.read.csv` is splittable; PERMISSIVE mode + a corrupt-record
  * column keeps bad rows observable instead of dropped. */
object CsvSource {

  final case class Options(header: Boolean = true, delimiter: String = ",",
                           nullValue: String = "")

  def read(spark: SparkSession, path: String, schema: StructType,
           opts: Options = Options()): DataFrame =
    spark.read
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter)
      .option("nullValue", opts.nullValue)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** Ingest: read, split valid/corrupt, land valid rows as parquet.
    * Returns (validCount, corruptCount). */
  def ingest(spark: SparkSession, src: String, schema: StructType,
             dest: String, opts: Options = Options()): (Long, Long) = {
    val df = read(spark, src, schema, opts).cache()
    try {
      val corrupt = df.filter(df.col("_corrupt_record").isNotNull).count()
      val valid = df.filter(df.col("_corrupt_record").isNull)
        .drop("_corrupt_record")
      valid.write.mode("overwrite").parquet(dest)
      (valid.count(), corrupt)
    } finally df.unpersist()
  }
}
