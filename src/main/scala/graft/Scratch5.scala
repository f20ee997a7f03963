package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: cost of repeated spark.read.parquet loader calls. */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-50s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("first load lineitem") { Tables.lineitem(spark, sfDir) }
    t("100 x load lineitem (df construction only)") {
      (1 to 100).foreach(_ => Tables.lineitem(spark, sfDir))
    }
    t("100 x load events (adaptive loader)") {
      (1 to 100).foreach(_ => Tables.events(spark, sfDir))
    }
    val schema = Tables.lineitem(spark, sfDir).schema
    t("100 x load lineitem WITH explicit schema") {
      (1 to 100).foreach(_ =>
        spark.read.schema(schema).parquet(s"$sfDir/lineitem.parquet"))
    }
    spark.stop()
  }
}
