package graft

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: decompose q170 (cash-flow statement) cost. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "base"
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (mode.contains("aqecache"))
      b0.config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val spark = b0.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-50s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // warmup
    Tables.lineitem(spark, sfDir).filter(col("l_orderkey") <= 600).count()

    (1 to 2).foreach { i =>
      import graft.operators.FifoValuation
      import graft.report.CashFlowStatement
      val dedupW = org.apache.spark.sql.expressions.Window
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
      t(s"[$i] lines count") { lines.count() }
      val deb = side(col("balance") > 0, col("balance"), "debit_id", "dd")
      val cred = side(col("balance") < 0, -col("balance"), "credit_id", "cd")
      t(s"[$i] deb+cred count") { deb.count(); cred.count() }
      val partials = FifoValuation.allocate(deb, cred, "account", bucketWidth = 64)
        .select(col("debit_id"), col("credit_id"),
          col("__matched").cast("double").as("amount"),
          greatest(col("dd"), col("cd")).as("max_d"))
      t(s"[$i] partials count") { partials.count() }
      val linesB = lines
        .select("line_id", "move_id", "account", "atype", "tag", "d", "balance")
      val linesC = (if (mode.contains("rep1")) linesB.repartition(1) else linesB).cache()
      val partialsC = (if (mode.contains("rep1")) partials.repartition(1) else partials).cache()
      t(s"[$i] cache materialize") { linesC.count(); partialsC.count() }
      var r: CashFlowStatement.Result = null
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet(): Unit
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration): Unit
        }
      }
      spark.sparkContext.addSparkListener(listener)
      if (mode.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (mode.contains("p1")) spark.conf.set("spark.sql.shuffle.partitions", "1")
      if (mode.contains("nobc")) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      if (mode.contains("shj")) spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      t(s"[$i] compute (the one collect)") {
        r = CashFlowStatement.compute(linesC, partialsC,
          Seq("a0"), LocalDate.of(1995, 1, 1), LocalDate.of(1995, 12, 31))
      }
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      if (mode.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "true")
      if (mode.contains("p1")) spark.conf.set("spark.sql.shuffle.partitions", "32")
      if (mode.contains("nobc")) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      if (mode.contains("shj")) spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      println(s"[scratch] jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        s"taskTimeSum=${taskMs.get / 1000.0}s")
      linesC.unpersist(); partialsC.unpersist()
      println("[scratch] sections sum check: " + r.sections.size)
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
