package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratch (r19, VERDICT r18 #8): re-run the q143/q150
  * recompute-vs-pin A/B for the DSIR per-doc feature frame `nf` with the
  * r18 n-gram kernel in place (the standing "stay unpinned" adjudication
  * priced the pre-kernel explode). */
object Scratch8 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val B = 1024L

    def scores(pin: Boolean): DataFrame = {
      val nf0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(graft.functions.PortableNgramHash.of(col("text"), 2)).as("bh"))
        .select(col("doc_id"), col("lang"), col("source"),
          pmod(col("bh"), lit(B)).as("b"))
        .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
        .agg(count(lit(1)).as("c"))
      val nf = if (pin) graft.FramePin.pin(nf0) else nf0
      val wt = nf.groupBy(col("b"))
        .agg(sum(col("c")).as("cs"),
          sum(when(col("lang") === "en", col("c"))).as("ct"))
        .select(col("b"),
          expr("(1000000 * (coalesce(ct, 0) + 1)) div (cs + 1)").as("w"))
      nf.join(broadcast(wt), Seq("b"))
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(sum(col("c")).as("n_bigrams"), sum(col("c") * col("w")).as("score"))
    }
    def q143Of(sc: DataFrame): DataFrame =
      sc.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"), col("source"))
            .orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_bigrams"), col("score"),
          when(col("rk") <= 3L, 1L).otherwise(0L).as("selected"))
        .orderBy(col("doc_id"))
    def q150Of(sc: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      sc.withColumn("wt", col("score"))
        .withColumn("cum", sum(col("wt")).over(w))
        .withColumn("total",
          max(col("cum")).over(Window.partitionBy(col("lang"), col("source"))))
        .filter(col("total") > 0)
        .withColumn("n_slots",
          expr("(4 * cum) div total") - expr("(4 * (cum - wt)) div total"))
        .filter(col("n_slots") > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_slots")).as("n_slots"),
          sum(col("score")).as("score_mass"), sum(col("n_bigrams")).as("n_bigrams"))
        .orderBy(col("lang"))
    }
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ab8] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { r =>
      println(s"--- round $r ---")
      t("q143 recompute") { noop(q143Of(scores(pin = false))) }
      t("q143 pin") { noop(q143Of(scores(pin = true))) }
      t("q150 recompute") { noop(q150Of(scores(pin = false))) }
      t("q150 pin") { noop(q150Of(scores(pin = true))) }
    }
    spark.stop()
  }
}
