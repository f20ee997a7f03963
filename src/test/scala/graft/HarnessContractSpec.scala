package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r7 harness contracts (VERDICT r6 "what's wrong" #3/#4 + next
  * list #2/#3): the schema-contract preflight catches testdata drift with
  * a message naming the column, Verify writes a RED row (never an absent
  * one) for a query that throws, and Bench records a failed query as
  * FAILED with no timing sample instead of timing the crash. */
class HarnessContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("schema contract holds on the driver-provided testdata, all tiers") {
    // a partial regeneration could drift one tier only — check all three
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
      assert(SchemaContract.drift(spark, d) == Seq.empty, s"tier $d")
  }

  test("events loader adapts both ts encodings to TIMESTAMP") {
    // current generation: timestamp[us] (TIMESTAMP_NTZ at the reader)
    val cur = Tables.events(spark, sfDir)
    assert(cur.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // legacy generation: TIMESTAMP(NANOS) read nanos-as-long — synthesize
    // a long-ts events file and load through the same adaptive path
    val dir = Files.createTempDirectory(Paths.get("target"), "evdrift").toString
    Tables.events(spark, sfDir).limit(10)
      .withColumn("ts", unix_micros(col("ts")) * 1000) // micros → fake nanos
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = Tables.events(spark, dir)
    assert(legacy.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // the two encodings decode to the same instants
    val a = cur.limit(10).select("event_id", "ts").collect().map(_.toString).sorted
    val b = legacy.select("event_id", "ts").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("schema drift is reported naming the drifted column") {
    // clone the testdata dir by re-pointing loaders at a temp dir where
    // every table is a symlink except events, which gets a drifted ts
    val dir = Files.createTempDirectory(Paths.get("target"), "drift")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
    Tables.events(spark, sfDir).limit(5)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd")) // ts → STRING
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val drift = SchemaContract.drift(spark, dir.toString)
    assert(drift.size == 1)
    // the adaptive loader itself rejects the unknown encoding, so the
    // drift line carries its message — which names the column and the
    // offending type (what the one-line diagnosis needs)
    assert(drift.head.contains("events.ts"))
    assert(drift.head.contains("StringType"))
    intercept[IllegalStateException] {
      SchemaContract.preflight(spark, dir.toString, "spec")
    }
  }

  test("additive drift (new column) warns but does not invalidate") {
    // r8 policy (SchemaContract scaladoc): a purely ADDED column changes
    // no gate's projection, so it is a warning, not an error — preflight
    // must NOT throw, and Bench must not self-invalidate on it
    val dir = Files.createTempDirectory(Paths.get("target"), "adddrift")
    for (t <- Seq("nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
    Tables.region(spark, sfDir)
      .withColumn("r_comment", lit("benign widening"))
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val (errors, warnings) = SchemaContract.driftDetailed(spark, dir.toString)
    assert(errors.isEmpty)
    assert(warnings == Seq("region.r_comment: UNEXPECTED column (STRING)"))
    SchemaContract.preflight(spark, dir.toString, "spec") // must not throw
    // the flattened view still surfaces it for contract-map maintenance
    assert(SchemaContract.drift(spark, dir.toString).nonEmpty)
  }

  test("bench retry keeps the quietest runs and detects window spread") {
    def run(cpu: Double, io: Double) = Bench.Run(cpu, io, Seq("q" -> 1.0), Nil)
    val quietA = run(1.60, 0.60); val quietB = run(1.65, 0.62)
    val quietC = run(1.62, 0.61)
    val cpuNoisy = run(4.80, 0.61); val ioNoisy = run(1.61, 2.10)
    // spread on either arm flags the window; a tight set does not
    assert(Bench.windowInflated(Seq(quietA, quietB, cpuNoisy)))
    assert(Bench.windowInflated(Seq(quietA, quietB, ioNoisy)))
    assert(!Bench.windowInflated(Seq(quietA, quietB, quietC)))
    // selection drops the noisy attempt regardless of which arm was loud
    assert(Bench.quietestSubset(
      Seq(cpuNoisy, quietA, ioNoisy, quietB, quietC), 3).toSet ==
      Set(quietA, quietB, quietC))
    // a probe of 0 (pre-field child / parse failure) ranks LAST — even a
    // measured-loud window beats it (loud-but-measured is normalizable;
    // unmeasured would enter the medians with factor 1.0 unflagged) —
    // but it still fills the set when measured runs are too few
    val legacy = run(0.0, 0.0)
    assert(Bench.quietestSubset(Seq(legacy, quietA, cpuNoisy), 2).toSet ==
      Set(quietA, cpuNoisy))
    assert(Bench.quietestSubset(Seq(legacy, quietA), 2).toSet ==
      Set(quietA, legacy))
    // uniformly-loaded host: factors ~1.0 everywhere -> no retry signal
    assert(!Bench.windowInflated(Seq(run(4.8, 2.1), run(4.85, 2.12), run(4.82, 2.08))))
  }

  test("anchor factors scale to the recorded quiet-class reference and " +
      "collapse same-code spread across unequal windows") {
    // r11 (VERDICT r10 next-list #1): total_anchor exists so two sessions
    // running IDENTICAL code on different-class windows report the same
    // number. The factor contract: reference probe → 1.0, a k×-slower
    // window → k, an UNMEASURED probe (0.0, pre-field child or parse
    // failure) → 1.0 — pass-through, never deflated against a reference
    // it was not compared to.
    val ref = Bench.AnchorProbeCpuSec
    assert(Bench.anchorFactors(Seq(ref)) == Seq(1.0))
    assert(Bench.anchorFactors(Seq(2 * ref, 0.0)) == Seq(2.0, 1.0))
    // the IO arm shares the factor contract with its own reference, and
    // its validity gate is the MEDIUM, measured: tmpfs-class probes only
    // (an NVMe-class ~0.6 s probe against the 0.205 s reference would
    // "anchor" by 3× of nonsense), any unmeasured probe invalidates
    val ioRef = Bench.AnchorProbeIoSec
    assert(Bench.anchorFactors(Seq(2 * ioRef), ioRef) == Seq(2.0))
    assert(Bench.anchorIoValid(Seq(0.2, 0.21, 0.3)))
    assert(!Bench.anchorIoValid(Seq(0.2, 0.6)), "NVMe-class probe must invalidate")
    assert(!Bench.anchorIoValid(Seq(0.2, 0.0)), "unmeasured probe must invalidate")
    assert(!Bench.anchorIoValid(Nil))
    // same-code collapse: a run whose window is k× the reference class has
    // samples ~k× the quiet-class time; dividing by its anchor factor
    // recovers the quiet-class number for BOTH windows, so the anchored
    // totals of a 1.0× and a 1.2× window agree where raw totals differ 20%
    val quietSamples = Seq(2.0, 5.0, 0.5)
    for (k <- Seq(1.0, 1.2, 1.5)) {
      val f = Bench.anchorFactors(Seq(k * ref)).head
      val anchored = quietSamples.map(t => k * t / f).sum
      assert(math.abs(anchored - quietSamples.sum) < 1e-9,
        s"window k=$k did not collapse: $anchored vs ${quietSamples.sum}")
    }
  }

  test("Verify writes a red-row marker for a query that throws") {
    val out = Files.createTempDirectory(Paths.get("target"), "vfail").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("deliberate gate failure")
    val okQ: (SparkSession, String) => DataFrame =
      (s, d) => Tables.region(s, d)
    val failed = Verify.run(spark,
      Map("q_boom" -> boom, "q_ok" -> okQ), sfDir, out)
    assert(failed == Seq("q_boom"))
    // the failed slot is a READABLE one-row parquet that can never match
    // an oracle schema — red, not absent, in every downstream compare
    val marker = spark.read.parquet(s"$out/q_boom")
    assert(marker.columns.toSeq == Seq("_graft_error"))
    assert(marker.count() == 1)
    assert(marker.head().getString(0).contains("deliberate gate failure"))
    assert(spark.read.parquet(s"$out/q_ok").count() > 0)
  }

  test("Bench records a crashed query as failed with no timing sample") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("bench crash")
    val okQ: (SparkSession, String) => DataFrame =
      (s, d) => Tables.region(s, d)
    val (ok, failed) = Bench.measureSuite(spark, sfDir,
      Seq("a_ok" -> okQ, "b_boom" -> boom))
    assert(failed == Seq("b_boom"))
    assert(ok.map(_._1) == Seq("a_ok"))
    assert(ok.head._2 > 0)
  }

  test("Bench child line round-trips through the parser exactly") {
    // format and parse are a spec'd PAIR: drift between them silently
    // drops samples (or the whole setup ledger) from the official
    // artifact — the r6 failure class. Cover the hard cases: scientific
    // notation with negative exponent, empty vs nonempty setup/failed,
    // and the all-failed run.
    val runs = Seq(
      Bench.Run(1.23, 0.45, Seq("q1" -> 0.5, "q2" -> 8.6e-4), Nil),
      Bench.Run(1.0, 2.0, Seq("q1" -> 1.5e3), Seq("q_boom", "q_bang"),
        Seq("setup_pairs05" -> 5.14, "setup_mh12" -> 2.0e-2)),
      Bench.Run(0.9, 0.1, Nil, Seq("q_only_failure")))
    for (r <- runs) {
      val parsed = Bench.parseChildLine(Bench.childLine(r, "/tmp/sf"))
      assert(parsed.contains(r), s"round-trip of $r")
    }
    // an unparseable line yields None, never a half-parsed Run
    assert(Bench.parseChildLine("""{"metric":"run","garbage":true}""").isEmpty)
  }

  test("Bench setup ledger is consumer-gated and builds the real memos") {
    // no memo consumer selected -> no setup lines, no build jobs
    assert(Bench.measureSetup(spark, sfDir, Set("q1_agg", "q80_traceability"))
      .isEmpty)
    // a q59-only suite needs the pair memo AND its cc layer, nothing else;
    // the builds run for real (ArtifactMemo) and each reports a time
    val lines = Bench.measureSetup(spark, sfDir, Set("q59_dup_clusters"))
    assert(lines.map(_._1) == Seq("setup_pairs05", "setup_cc05"))
    assert(lines.forall(_._2 > 0))
    // the artifact now exists: the consumer gate runs without rebuilding
    // (smoke: it still returns its oracle-shaped result)
    assert(SparkEntry.queries("q59_dup_clusters")(spark, sfDir).count() > 0)
  }

  test("Bench round stamp counts only official driver bench artifacts") {
    // r10: the BENCH_r{N}_driver.json mirror must stamp the round IN
    // PROGRESS. Only `BENCH_r<N>.json` exactly may count — the round's
    // own CORRECTNESS file can land BEFORE the driver's bench, and the
    // suffixed _builder/_driver snapshots are committed mid-round under
    // the CURRENT number; counting either would bump the stamp past the
    // live round.
    val zoo = Seq("BENCH_r09.json", "BENCH_r09_builder3.json",
      "BENCH_r10_builder.json", "BENCH_r10_driver.json",
      "CORRECTNESS_r10.json", "CROSSCHECK_r10_sf0.1.json",
      "SCALE_STRESS_r10.json", "VERDICT.md", "build.sbt")
    assert(Bench.currentRound(zoo) == Some(10))
    // the official artifact for the round landing mid-run (double bench
    // in one round) legitimately advances the stamp
    assert(Bench.currentRound(zoo :+ "BENCH_r10.json") == Some(11))
    // fresh checkout: nothing to stamp against
    assert(Bench.currentRound(Seq("build.sbt", "SURVEY.md")).isEmpty)
  }
}
