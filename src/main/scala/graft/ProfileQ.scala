package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): per-query cost attribution.
  * For each named query it reports, in one JVM:
  *   - build   — seconds to construct the DataFrame (driver-side work in
  *               the gate body: bounded collects, memo builds, fixture
  *               staging all land here);
  *   - plan    — seconds for `queryExecution.executedPlan` to materialize
  *               (analysis + optimization + physical planning);
  *   - run1    — first `.count()` (includes codegen/janino compile and
  *               AQE re-planning);
  *   - run2    — second `.count()` on a FRESH build of the same query
  *               (warm JIT + warm codegen cache — approximates the
  *               steady-state execution cost).
  * Usage: runMain graft.ProfileQ <sfDir> <q1,q2,...|all> [cpus]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Scratch.benchLocalDir()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // warmup: absorb session/codegen cold start with one cheap query
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    println(f"${"query"}%-34s ${"build"}%8s ${"plan"}%8s ${"run1"}%8s ${"run2"}%8s")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      try {
        val (df1, tBuild) = t(fn(spark, sfDir))
        val (_, tPlan) = t(df1.queryExecution.executedPlan)
        val (_, tRun1) = t(df1.count())
        spark.catalog.clearCache(); System.gc()
        val (df2, _) = t(fn(spark, sfDir))
        val (_, tRun2) = t(df2.count())
        println(f"$n%-34s $tBuild%8.2f $tPlan%8.2f $tRun1%8.2f $tRun2%8.2f")
      } catch { case e: Throwable =>
        println(f"$n%-34s FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
