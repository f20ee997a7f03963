package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch (r19): warm single-JVM A/B of the Jaccard pair pipeline —
  * posting-list kernel vs the r18 index self-join — on the full corpus,
  * the q166 skewed corpus, and the q62 survivor corpus. */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pairsJoin(docs: DataFrame, threshold: Double): DataFrame = {
      val sh0 = graft.FramePin.pin(docs.select(col("doc_id"),
        explode(graft.functions.ShingleHash.distinctOf(col("text"))).as("s")))
      val cap = docs.agg(greatest(lit(5L),
        floor(count(lit(1)) / lit(100)).cast("long")).as("cap"))
      val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(cap)).filter(col("df") > col("cap")).select(col("s"))
      val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val shN = graft.FramePin.pin(sh.join(sizes, Seq("doc_id")))
      val lt = lit(math.max(threshold - 1e-4, 0.0))
      shN.as("a").join(shN.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n") * lt <= col("b.n") && col("b.n") * lt <= col("a.n"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("n1"), col("b.n").as("n2"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4))
        .filter(col("jaccard") >= threshold)
        .select(col("d1"), col("d2"), col("jaccard"))
    }

    val docs = Tables.documents(spark, sfDir)
    val skewed = docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0,
        concat(lit("common portal header shared across every page "), col("text")))
        .otherwise(col("text")).as("text"))
    val nWords = size(split(col("text"), " "))
    val survivors = docs.filter(nWords.between(20, 80))

    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $label%-28s $s%7.3f s")
      s
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      for ((name, corpus) <- Seq(("full", docs), ("skewed", skewed),
          ("survivors", survivors))) {
        t(s"$name join") { noop(pairsJoin(corpus, 0.5)) }
        t(s"$name kernel") { noop(graft.queries.DedupOps.jaccardPairs(corpus, 0.5)) }
      }
    }
    spark.stop()
  }
}
