package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): sweep every registered
  * query's physical plan and report whole-stage-codegen method sizes.
  * HotSpot refuses to JIT-compile methods over ~8000 bytes of bytecode
  * (-XX:DontCompileHugeMethods, default on), so any generated method
  * above that bound runs INTERPRETED — the silent 10-50x per-row tax the
  * r18 tax-family fix removed. This sweep finds the rest of the class.
  * Planning only (no execution). Usage:
  *   runMain graft.CodegenSweep <sfDir> [minMethodSize]
  */
object CodegenSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val minReport = if (args.length > 1) args(1).toInt else 8000
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizeRe = "maxMethodCodeSize:(-?\\d+)".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val df = fn(spark, sfDir)
        val code = org.apache.spark.sql.execution.debug.codegenString(
          df.queryExecution.executedPlan)
        val sizes = sizeRe.findAllMatchIn(code).map(_.group(1).toInt).toSeq
        val worst = if (sizes.isEmpty) 0 else sizes.max
        val failed = sizes.contains(-1)
        if (worst >= minReport || failed)
          println(f"[codegen] $n%-34s maxMethod=$worst%6d chars=${code.length}%8d" +
            (if (failed) "  COMPILE-FAILED(-1)" else ""))
      } catch { case e: Throwable =>
        println(f"[codegen] $n%-34s SWEEP-ERROR: ${String.valueOf(e.getMessage).take(100)}")
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
