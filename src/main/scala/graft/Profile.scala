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

/** Dev tool: stage-level timing inside q62 (curate pipeline). */
object ProfileCurate {
  import Profile.time
  import graft.operators.DupClusters
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
    val nWords = size(split(col("text"), " "))
    val quality = docs.filter(nWords.between(20, 80))
    time("quality count") { println("q=" + quality.count()) }
    val exactSurvivors = quality
      .withColumn("__h", md5(col("text")))
      .withColumn("__keep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col("doc_id") === col("__keep"))
      .drop("__h", "__keep")
      .cache()
    time("exact survivors (cache)") { println("s=" + exactSurvivors.count()) }
    val pairs = queries.DedupOps.jaccardPairs(exactSurvivors, 0.5)
      .select(col("d1").as("a"), col("d2").as("b"))
    time("pairs on survivors") { println("p=" + pairs.count()) }
    val clusters = time("cc") {
      DupClusters.connectedComponents(pairs, uniquePairs = true)
        .localCheckpoint(true)
    }
    val nearSurvivors = exactSurvivors
      .join(clusters, exactSurvivors("doc_id") === clusters("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .drop("id", "cluster")
    time("near survivors + stats") {
      nearSurvivors.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs")).collect()
    }
    time("q62 full uninstrumented") {
      graft.pipelines.TrainingDataPipeline.curate(
        Tables.documents(spark, sfDir),
        d => queries.DedupOps.jaccardPairs(d, 0.5), 20, 80).count()
    }
    spark.stop()
  }
}

/** Dev tool: bench-like timing of ONE named gate — warmup on q1_agg, then
  * N samples of the gate with clearCache + GC between (the same cache
  * hygiene [[Bench.measureSuite]] applies), so the number matches what the
  * bench's per-query median measures without paying a full-suite run. */
object ProfileOne {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q62_curation_pipeline"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    time("warmup q1_agg") { SparkEntry.queries("q1_agg")(spark, sfDir).count() }
    spark.catalog.clearCache(); System.gc()
    for (i <- 1 to n) {
      time(s"$name run $i") { println("rows=" + SparkEntry.queries(name)(spark, sfDir).count()) }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

/** Dev tool: per-round timing of the CC loop (replicates DupClusters). */
object ProfileCCRounds {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val pairs = queries.DedupOps.jaccardPairs(docs, 0.5)
      .select(col("d1").as("a"), col("d2").as("b"))
    val sym = pairs.select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b"))).cache()
    time("sym materialize") { println("edges=" + sym.count()) }
    var labels = time("seed") {
      sym.groupBy(col("a"))
        .agg(least(col("a"), min(col("b"))).as("cluster"))
        .select(col("a").as("id"), col("cluster"))
        .localCheckpoint(true)
    }
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid")).agg(min(col("cluster")).as("nbr_min"))
      val prop = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("c1"),
          col("cluster").as("c0"))
      val next0 = prop.join(
          labels.select(col("id").as("pid"), col("cluster").as("pc")),
          col("c1") === col("pid"), "left")
        .select(col("id"),
          least(col("c1"), coalesce(col("pc"), col("c1"))).as("cluster"),
          col("c0").as("prev"))
      val next = next0.localCheckpoint(false)
      time(s"round $round (count+checkpoint)") {
        changed = next.filter(col("cluster") < col("prev")).count()
      }
      println(s"round $round changed=$changed")
      labels = next.select(col("id"), col("cluster"))
    }
    spark.stop()
  }
}

/** Dev tool: q134 bigram stage timing. */
object Profile134 {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    time("warmup") { docs.count() }
    val ws = split(col("text"), " ")
    val exploded = docs.filter(size(ws) >= 2)
      .select(explode(transform(sequence(lit(0), size(ws) - lit(2)),
        i => concat_ws(" ", element_at(ws, i + lit(1)),
          element_at(ws, i + lit(2))))).as("bigram"))
    time("explode only (count)") { println(exploded.count()) }
    time("explode+agg") {
      println(exploded.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5).count())
    }
    time("full q134") {
      queries.TextOps.q134(spark, sfDir).collect()
    }
    time("full q134 again") {
      queries.TextOps.q134(spark, sfDir).collect()
    }
    spark.stop()
  }
}

/** Dev tool: q134 variant — pre-materialized words array. */
object Profile134b {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    time("warmup") { docs.count() }
    val exploded = docs
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - lit(2)),
        i => concat_ws(" ", element_at(col("ws"), i + lit(1)),
          element_at(col("ws"), i + lit(2))))).as("bigram"))
    time("explode only (ws materialized)") { println(exploded.count()) }
    time("agg+topk") {
      exploded.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .orderBy(col("n").desc, col("bigram")).limit(50).collect()
    }
    // zip_with variant: pair ws with its own tail, no index arithmetic
    val z = docs.select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "zip_with(slice(ws, 1, size(ws)-1), slice(ws, 2, size(ws)-1), (a, b) -> concat(a, ' ', b))")).as("bigram"))
    time("zip_with explode") { println(z.count()) }
    spark.stop()
  }
}

/** Dev tool: q85 timing, warm. */
object Profile85 {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.embeddings(spark, sfDir).count()
    time("q85 run 1") { queries.SimilarityOps.q85(spark, sfDir).collect() }
    spark.catalog.clearCache()
    time("q85 run 2") { queries.SimilarityOps.q85(spark, sfDir).collect() }
    spark.catalog.clearCache()
    time("q85 run 3") { queries.SimilarityOps.q85(spark, sfDir).collect() }
    spark.stop()
  }
}

/** Dev tool: old-vs-new kmeans assign shapes, cold-ish comparison. */
object Profile85b {
  import Profile.time
  import org.apache.spark.sql.{Column, DataFrame}
  private val Q = 1000000.0
  private def d2(vec: Column, cen: Column): Column =
    aggregate(zip_with(vec, cen, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
  def trainOld(vecs: DataFrame, k: Int, iterations: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), col("embedding")).cache()
    var centroids = v.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), _.cast("double")).as("cvec"))
      .localCheckpoint(true)
    def assign(c: DataFrame): DataFrame = v
      .crossJoin(broadcast(c))
      .select(col("vec_id"), col("embedding"),
        struct(d2(col("embedding"), col("cvec")).as("d"), col("cid")).as("dc"))
      .groupBy(col("vec_id"), col("embedding"))
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("embedding"), col("m.cid").as("cid"))
    var it = 0
    while (it < iterations) {
      val upd = assign(centroids)
        .select(col("cid"), posexplode(col("embedding")))
        .select(col("cid"), col("pos"),
          floor(col("col").cast("double") * Q + 0.5).cast("long").as("q"))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          (col("sq").cast("double") / (col("n") * lit(Q))).as("mean"))
      centroids = upd.groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cvec"))
        .localCheckpoint(false)
      it += 1
    }
    val assignment = assign(centroids)
      .select(col("vec_id"), col("cid")).localCheckpoint(true)
    v.unpersist()
    assignment
  }
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "old"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.embeddings(spark, sfDir).count()
    if (which == "old")
      time("OLD train cold") { println(trainOld(Tables.embeddings(spark, sfDir), 8, 2).count()) }
    else
      time("NEW train cold") { println(graft.operators.KMeansQuantizer.train(Tables.embeddings(spark, sfDir), 8, 2)._1.count()) }
    spark.stop()
  }
}

/** Dev tool: streaming per-trigger fixed-cost A/B (r9, VERDICT r8 #4) —
  * the SAME sessionization pipeline over the SAME data, staged as 2, 4,
  * or 8 real micro-batches (+2 sentinel batches each). The per-trigger
  * slope quantifies how much of a streaming gate is fixed micro-batch
  * overhead (planning + state-store commit + sink/offset-log I/O) versus
  * data, i.e. what batch-count reduction COULD buy if the gates' arrival
  * semantics allowed it (they don't: the fixtures pin event-time-ordered
  * quartile arrival and watermark advancement, and q165's restart needs
  * a mid-stream boundary). */
object ProfileStream {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .filter(col("user_id") % 20 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("double").as("value"))
      .cache()
    val maxTs = evs.agg(max(col("ts"))).head().getTimestamp(0)
    time("warmup (slice count)") { println("n=" + evs.count()) }
    for (n <- Seq(2, 4, 8); rep <- 1 to 2) {
      val staged = evs.withColumn("__b",
        ntile(n).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("ts"), col("event_id"))))
      val sentinels = Seq(
        (-1L, new java.sql.Timestamp(maxTs.getTime + 86400000L), -1L, "x", 0.0),
        (-2L, new java.sql.Timestamp(maxTs.getTime + 93600000L), -1L, "x", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val src = graft.queries.GateOps.stageBatches(
        staged.unionByName(sentinels.withColumn("__b",
          when(col("event_id") === -1L, lit(n + 1)).otherwise(lit(n + 2)))),
        n + 2, s"profstream$n")
      val store = Scratch.fresh(s"profstream${n}_store")
      val ckpt = Scratch.fresh(s"profstream${n}_ckpt")
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getPath)
        .as[graft.streaming.EventsStream.Event]
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      time(s"sessionize ${n + 2} triggers (rep $rep)") {
        try {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          val q = graft.streaming.EventsStream.sessionize(stream, gapMinutes = 30)
            .writeStream
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
            .format("parquet")
            .option("path", store.getPath)
            .option("checkpointLocation", ckpt.getPath)
            .start()
          try q.processAllAvailable() finally q.stop()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      println("sessions=" + spark.read.parquet(store.getPath)
        .filter(col("user_id") >= 0).count())
    }
    spark.stop()
  }
}

/** Dev tool: q80 stage timing — edge-layer construction vs the reach
  * probe vs the final sort, warm. */
object Profile80 {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.DataFrame
    time("warmup q1_agg") { SparkEntry.queries("q1_agg")(spark, sfDir).count() }
    spark.catalog.clearCache(); System.gc()
    val T = 1000000000L
    def li = Tables.lineitem(spark, sfDir).filter(col("l_partkey") <= 20)
    def mkE1: DataFrame = li.select((col("l_partkey") + lit(T)).as("src"),
      (col("l_orderkey") + lit(2 * T)).as("dst")).distinct()
    for (i <- 1 to 3) {
      val e1 = mkE1.cache()
      time(s"[$i] e1 cache+count") { println("e1=" + e1.count()) }
      val e2 = Tables.orders(spark, sfDir).select(
        (col("o_orderkey") + lit(2 * T)).as("src"),
        (col("o_custkey") + lit(3 * T)).as("dst"))
      val e3 = Tables.customer(spark, sfDir).select(
        (col("c_custkey") + lit(3 * T)).as("src"),
        (col("c_nationkey") + lit(4 * T)).as("dst"))
      val e2p = e2.join(e1.select(col("dst").as("j")).distinct(),
        col("src") === col("j"), "left_semi")
      val e3p = e3.join(e2p.select(col("dst").as("j")).distinct(),
        col("src") === col("j"), "left_semi")
      val union = e1.unionByName(e2p).unionByName(e3p)
      val probe = time(s"[$i] A: edges limit-collect") {
        union.limit(262145).collect()
      }
      println("edges=" + probe.length)
      // B: no-distinct broadcast build sides (semi-join dedups by nature)
      val e2b = e2.join(broadcast(e1.select(col("dst").as("j"))),
        col("src") === col("j"), "left_semi")
      val e3b = e3.join(broadcast(e2b.select(col("dst").as("j"))),
        col("src") === col("j"), "left_semi")
      val unionB = e1.unionByName(e2b).unionByName(e3b)
      println("edgesB=" + time(s"[$i] B: bcast-nodistinct limit-collect") {
        unionB.limit(262145).collect() }.length)
      println("edgesC=" + time(s"[$i] C: B + coalesce(1)") {
        unionB.coalesce(1).limit(262145).collect() }.length)
      val cached = unionB.cache()
      println("edgesD=" + time(s"[$i] D: B + cache+count+collect") {
        if (cached.count() <= 262144) cached.collect().length else -1 })
      cached.unpersist()
      val seedsArr = time(s"[$i] seeds distinct limit-collect") {
        e1.select(col("src").as("id")).distinct().limit(1025).collect()
      }
      println("seeds=" + seedsArr.length)
      println("seedsB=" + time(s"[$i] seeds coalesce(1) limit-collect") {
        e1.select(col("src").as("id")).distinct().coalesce(1)
          .limit(1025).collect() }.length)
      time(s"[$i] full q80 (count)") {
        println("rows=" + SparkEntry.queries("q80_traceability")(spark, sfDir).count())
      }
      e1.unpersist()
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

/** Dev tool: candidate-pair count with/without the length filter. */
object ProfileLenFilter {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val sh0 = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHash.distinctOf(col("text"))).as("s")).cache()
    val sizes = sh0.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shN = sh0.join(broadcast(sizes), Seq("doc_id"))
    val all = shN.as("a").join(shN.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    println("joinrows_nofilter=" + all.count())
    val filt = shN.as("a").join(shN.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") * 0.5 <= col("b.n") && col("b.n") * 0.5 <= col("a.n"))
    println("joinrows_lenfilter=" + filt.count())
    spark.stop()
  }
}

/** Dev tool: stage-level timing of the q170 cash-flow fixture vs the
  * statement body (relative A/B, not a bench claim). */
object ProfileCashFlow {
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
    import graft.operators.FifoValuation
    import graft.report.CashFlowStatement
    for (i <- 1 to 3) {
      val dedupW = Window
        .partitionBy(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_partkey"), col("l_suppkey"))
      val li = Tables.lineitem(spark, sfDir).filter(col("l_orderkey") <= 600)
        .withColumn("__rn", row_number().over(dedupW)).filter(col("__rn") === 1)
      val qty = col("l_quantity").cast("long")
      val lines = li.select(
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("line_id"),
          col("l_orderkey").cast("long").as("move_id"),
          concat(lit("a"), (col("l_partkey") % 8).cast("string")).as("account"),
          (col("l_partkey") % 8).as("b"),
          when(col("l_linenumber") % 2 === 1, qty).otherwise(-qty)
            .cast("double").as("balance"),
          col("l_shipdate").cast("timestamp").as("d"))
        .withColumn("atype",
          when(col("b") === 0, "asset_cash")
            .when(col("b").isin(1, 2), "asset_receivable")
            .when(col("b") === 3, "liability_payable")
            .otherwise("asset_current"))
        .withColumn("tag",
          when(col("b") === 4, "operating").when(col("b") === 5, "investing")
            .when(col("b") === 6, "financing"))
      def side(pred: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column,
               idName: String, dName: String) =
        FifoValuation.cumInterval(
          lines.filter(pred).select(col("line_id").as(idName),
            col("account"), col("d").as(dName), q.cast("long").as("q")),
          col("account"), Seq(col(dName), col(idName)), col("q")).drop("q")
      val deb = time("fixture: deb side")(side(col("balance") > 0, col("balance"), "debit_id", "dd").cache())
      time("fixture: deb count")(deb.count())
      val cred = side(col("balance") < 0, -col("balance"), "credit_id", "cd")
      val partials = FifoValuation.allocate(deb, cred, "account", bucketWidth = 64)
        .select(col("debit_id"), col("credit_id"),
          col("__matched").cast("double").as("amount"),
          greatest(col("dd"), col("cd")).as("max_d"))
      val linesC = time("fixture: lines cache") {
        val c = lines.select("line_id", "move_id", "account", "atype", "tag", "d", "balance").cache()
        c.count(); c
      }
      val partialsC = time("fixture: partials cache") {
        val c = partials.cache(); c.count(); c
      }
      val r = time("statement: compute")(CashFlowStatement.compute(linesC, partialsC,
        Seq("a0"), java.time.LocalDate.of(1995, 1, 1), java.time.LocalDate.of(1995, 12, 31)))
      println("sections=" + r.sections.size)
      linesC.unpersist(); partialsC.unpersist(); deb.unpersist()
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
