package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing experiments for the jaccard pair source
  * (not part of the driver contract). */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    val ws = split(col("text"), " ")
    def shingleHashes: DataFrame = docs
      .filter(size(ws) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(ws) - lit(3)),
          i => concat_ws(" ",
            element_at(ws, i + lit(1)),
            element_at(ws, i + lit(2)),
            element_at(ws, i + lit(3))))).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .distinct()

    val capDf = docs.agg(greatest(lit(5L),
      floor(count(lit(1)) / lit(100)).cast("long")).as("cap"))

    time("explode+hash+distinct only") { shingleHashes.count() }

    // variant A (current): window df + crossJoin cap + self-join
    time("A: window df -> pairs") {
      val sh = shingleHashes
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
        .crossJoin(broadcast(capDf))
        .filter(col("df") <= col("cap")).drop("df", "cap")
        .cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val out = inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .filter(round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4) >= 0.5)
        .count()
      println(s"[profile] A pairs=$out")
    }

    // variant B: df via aggregate + semi-join keep, then self-join
    time("B: agg df + join -> pairs") {
      val sh0 = shingleHashes
      val keep = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(capDf))
        .filter(col("df") <= col("cap")).select(col("s"))
      val sh = sh0.join(keep, Seq("s")).cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val out = inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .filter(round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4) >= 0.5)
        .count()
      println(s"[profile] B pairs=$out")
    }

    // variant C: grouped posting lists (collect_set bounded AFTER df filter)
    time("C: posting lists -> pairs") {
      val sh0 = shingleHashes
      val lists0 = sh0.groupBy(col("s")).agg(collect_set(col("doc_id")).as("ds"))
        .crossJoin(broadcast(capDf))
        .filter(size(col("ds")) <= col("cap"))
        .select(col("ds")).cache()
      val sizes = lists0.select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val lists = lists0.filter(size(col("ds")) >= 2)
      val pairs = lists.select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(least(x, y) as d1, greatest(x, y) as d2))))")).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val out = pairs
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .filter(round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4) >= 0.5)
        .count()
      println(s"[profile] C pairs=$out")
    }

    spark.stop()
  }
}

/** Dev tool: stage-level timing for q59 (pairs vs clustering rounds). */
object ProfileCC {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    // warmup scan
    time("warmup docs scan") { docs.count() }
    val pairs = queries.DedupOps.jaccardPairs(docs, 0.5)
      .select(col("d1").as("a"), col("d2").as("b"))
    time("pairs only (cached after)") { println("n_pairs=" + pairs.cache().count()) }
    time("cc on cached pairs") {
      println("n_lab=" + operators.DupClusters
        .connectedComponents(pairs, uniquePairs = true).count())
    }
    val pairs2 = queries.DedupOps.jaccardPairs(docs, 0.5)
      .select(col("d1").as("a"), col("d2").as("b"))
    time("q59 full (uncached pairs + cc)") {
      println("n=" + operators.DupClusters
        .connectedComponents(pairs2, uniquePairs = true).count())
    }
    spark.stop()
  }
}

/** Dev tool: stage-level timing inside the CURRENT jaccardPairs shape
  * (kernel-distinct shingles at the scan, df-cap via broadcast hot-set
  * anti-join). Historical variants A/B/C above are kept as the record of
  * the experiments that led here. */
object ProfilePairs {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    time("warmup docs scan") { docs.count() }
    val sh0 = docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash.distinctOf(col("text"))).as("s"))
      .cache()
    time("sh0 = kernel-distinct explode + cache") { println(sh0.count()) }
    val cap = docs.agg(greatest(lit(5L), floor(count(lit(1)) / lit(100)).cast("long")).as("cap"))
    val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(cap)).filter(col("df") > col("cap")).select(col("s"))
    time("hot set (df agg)") { println(hot.count()) }
    val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    time("sizes") { println(sizes.count()) }
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    time("self-join + pair agg") { println(inter.count()) }
    spark.stop()
  }
}
