package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Benchmark main. Single-run timings at sf0.1 carry a measured ±30 %
  * run-to-run band on the heavy dedup queries (q62 spanned 4.6–9.6 s across
  * round-4 runs), so one run cannot support any regression/improvement
  * claim. This harness therefore runs the WHOLE suite N times (default 3),
  * each in a FRESH child JVM (same flags/classpath as this one — cold JIT,
  * cold code cache, no cross-run heap contamination), and reports the
  * per-query MEDIAN as the headline number:
  *   - stdout (driver contract, ONE line): {"metric":"total","value":Σ
  *     medians,"unit":"sec","queries":{q→median},"sf":…,"runs":N,
  *     "min_total":…,"max_total":…, plus the ambient fields below}
  *   - `target/bench_runs_latest.json`: the full spread — per-query
  *     min/median/max plus every raw sample — for reading past the
  *     driver's 2000-char tail truncation.
  *
  * Metric semantics (pinned; the r5 VERDICT/ADVICE asked for this to be
  * explicit): `value` is the SUM OF PER-QUERY MEDIANS across the fresh-JVM
  * runs — a robust synthetic total no single run produced. `min_total` /
  * `max_total` bound it with per-query extremes; `run_totals` (in the
  * target file) are the actual single-run sums. The one-line JSON carries
  * `"semantics":"sum_of_per_query_medians"` so downstream tooling cannot
  * silently conflate it with a single-run total.
  *
  * AMBIENT AWARENESS (r5: same-code totals spanned 103–138 s purely on
  * co-tenant host load, and the official snapshot rode an inflated
  * window): each run brackets its suite with a fixed CPU-bound
  * calibration probe (8 threads × a fixed xorshift count — pure compute,
  * no allocation, no I/O) and reports the faster of the two probes.
  * Co-tenant load inflates the probe the same way it inflates Spark's
  * compute-bound stages, so the ratio of a run's probe to the BEST probe
  * across runs estimates that window's inflation factor. The driver line
  * then carries:
  *   - `probe_sec`: per-run probe seconds;
  *   - `inflation`: per-run probe ratio to the best run (1.0 = quietest);
  *   - `total_norm`: Σ per-query medians after dividing every sample by
  *     its run's inflation factor — the load-corrected headline;
  *   - `ambient_inflated`: true when the spread of factors exceeds 10 %,
  *     i.e. the raw medians mix materially unequal windows and
  *     `total_norm`/`min_total` are the defensible numbers.
  * The probe cannot conjure a quiet machine — if ALL runs are inflated,
  * factors read ~1.0 and `total_norm` stays pessimistic; it detects
  * UNEQUAL windows (the r5 failure mode: comparing a quiet round-4 number
  * against an inflated round-5 one).
  *
  * `SPARK_GRAFT_BENCH_RUNS=1` (or any child-spawn failure) degrades to the
  * old in-process single run, so the driver always gets its line. */
object Bench {

  /** Wall seconds for one xorshift64* thread per host vCPU (≤32) ×
    * 4·10⁸ steps each (~1.6 s quiet on the 32-vCPU test host — record the
    * quiet reference when it moves; the ABSOLUTE value anchors
    * cross-session comparison, the per-run ratios anchor within-session).
    * Width-matching the host matters: an 8-thread probe rode out a window
    * in which 32-wide Spark stages ran ~15 % slow, because the ambient
    * co-tenant load left 8 cores' worth of headroom — saturating all
    * vCPUs senses exactly the contention the suite feels. Returns the
    * elapsed time of the slowest thread; callers take the min over two
    * brackets. */
  private def calibrationProbe(): Double = {
    val threads = math.min(32, Runtime.getRuntime.availableProcessors())
    val iters = 400000000L
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0L
        while (i < iters) {
          x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
          x *= 0x2545F4914F6CDD1DL
          i += 1
        }
        sink.addAndGet(x): Unit // defeat dead-code elimination
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full timed pass over the registered queries (current session). */
  private def measure(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    // Dev-only subset filter (driver leaves it unset → full run).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Untimed warmup: absorb JVM/codegen/scan-init cost so per-query numbers
    // measure the queries, not SparkSession startup. Runs the suite's OWN
    // first query (not an arbitrary Map-order one — that could be an
    // expensive streaming gate on a 3-query probe run).
    try suite.headOption.foreach(_._2(spark, sfDir).count())
    catch { case _: Throwable => () }
    suite
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop per-query caches so later queries aren't penalized by GC/evict;
        // localCheckpoint blocks are only released via the ContextCleaner on
        // GC, so nudge it — otherwise iterative queries' checkpoint RDDs pile
        // up and later queries pay their eviction at random times
        spark.catalog.clearCache()
        System.gc()
        name -> dt
      }
  }

  private def qJson(rs: Seq[(String, Double)]): String =
    rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** One run = probe, suite, probe: ambient load is sampled in the same
    * window the suite ran in (min of the two brackets — the best the
    * window allowed). */
  private def inProcessRun(sfDir: String, cpus: String): (Double, Seq[(String, Double)]) = {
    val p1 = calibrationProbe()
    val spark = session(cpus)
    val rs = try measure(spark, sfDir) finally spark.stop()
    val p2 = calibrationProbe()
    (math.min(p1, p2), rs)
  }

  /** Spawn one fresh child JVM (this JVM's flags + classpath, inherited
    * env) running `graft.Bench --child`; parse its one-line JSON back into
    * (probe seconds, per-query seconds). None on any launch/parse failure. */
  private def spawnRun(i: Int, runs: Int): Option[(Double, Seq[(String, Double)])] = {
    try {
      val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xdebug"))
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench", "--child")
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT) // Spark logs → stderr
      val p = pb.start()
      // drain stdout on a separate thread: reading to EOF on THIS thread
      // would block until the child exits, making the waitFor timeout and
      // the destroyForcibly fallback unreachable against a hung child
      val outBuf = new java.util.concurrent.atomic.AtomicReference[String]("")
      val drainer = new Thread(() =>
        outBuf.set(new String(p.getInputStream.readAllBytes(), "UTF-8")))
      drainer.setDaemon(true)
      drainer.start()
      if (!p.waitFor(45, java.util.concurrent.TimeUnit.MINUTES)) {
        p.destroyForcibly(); System.err.println(s"[bench] run $i/$runs timed out"); return None
      }
      drainer.join(60000)
      val out = outBuf.get()
      val line = out.linesIterator.find(_.startsWith("""{"metric""""))
      line.flatMap { l =>
        val probe = "\"probe\":([0-9.eE+\\-]+)".r.findFirstMatchIn(l)
          .map(_.group(1).toDouble).getOrElse(0.0)
        val body = l.substring(l.indexOf("\"queries\":{") + "\"queries\":{".length)
        // the number class must admit negative exponents (8.6E-4 from a
        // sub-millisecond sample) or the whole run's samples are dropped
        val pairs = "\"([^\"]+)\":([0-9.eE+\\-]+)".r.findAllMatchIn(
          body.take(body.indexOf('}'))).map(m => m.group(1) -> m.group(2).toDouble).toSeq
        if (pairs.isEmpty) None else Some((probe, pairs))
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] run $i/$runs failed to spawn: $e"); None
    }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    if (args.contains("--child")) {
      val (probe, rs) = inProcessRun(sfDir, cpus)
      val total = rs.map(_._2).sum
      println(s"""{"metric":"run","value":$total,"unit":"sec","probe":$probe,"queries":${qJson(rs)},"sf":"$sfDir"}""")
      return
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val samples: Seq[(Double, Seq[(String, Double)])] =
      if (runs == 1) Seq(inProcessRun(sfDir, cpus))
      else {
        val ok = (1 to runs).flatMap(i => spawnRun(i, runs))
        if (ok.nonEmpty) ok
        else { // degrade rather than give the driver nothing
          System.err.println("[bench] all child runs failed; in-process fallback")
          Seq(inProcessRun(sfDir, cpus))
        }
      }
    // per-run ambient factor: probe relative to the quietest run's probe
    // (a probe of 0 means the child predates the field / failed to parse —
    // treat as the baseline so it never skews normalization)
    val probes = samples.map(_._1)
    val bestProbe = probes.filter(_ > 0) match {
      case Seq() => 0.0
      case ps => ps.min
    }
    val factors = probes.map(p => if (p > 0 && bestProbe > 0) p / bestProbe else 1.0)
    val inflated = factors.max > 1.10
    // per-query spread over however many runs survived, in suite order
    val names = samples.head._2.map(_._1)
    val byName = names.map { n =>
      n -> samples.flatMap(_._2.collectFirst { case (`n`, v) => v })
    }
    // normalized samples: each divided by its run's ambient factor
    val byNameNorm = names.map { n =>
      n -> samples.flatMap { case (p, rs) =>
        val f = if (p > 0 && bestProbe > 0) p / bestProbe else 1.0
        rs.collectFirst { case (`n`, v) => v / f }
      }
    }
    val med = byName.map { case (n, vs) => n -> median(vs) }
    val total = med.map(_._2).sum
    val totalNorm = byNameNorm.map { case (_, vs) => median(vs) }.sum
    val minTotal = byName.map(_._2.min).sum
    val maxTotal = byName.map(_._2.max).sum
    val probesJ = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val factorsJ = factors.map(f => f"$f%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","semantics":"sum_of_per_query_medians","queries":${qJson(med)},"sf":"$sfDir","runs":${samples.size},"min_total":$minTotal,"max_total":$maxTotal,"probe_sec":$probesJ,"inflation":$factorsJ,"total_norm":$totalNorm,"ambient_inflated":$inflated}""")
    // full spread snapshot (per-query min/med/max + raw samples) — the
    // driver's BENCH tail truncates at 2000 chars, this file never does
    val detail = byName.map { case (n, vs) =>
      s""""$n":{"med":${median(vs)},"min":${vs.min},"max":${vs.max},"samples":[${vs.mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val runTotals = samples.map(_._2.map(_._2).sum).mkString("[", ",", "]")
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench_runs_latest.json"),
      s"""{"sf":"$sfDir","runs":${samples.size},"run_totals":$runTotals,"total_med":$total,"total_norm":$totalNorm,"probe_sec":$probesJ,"inflation":$factorsJ,"ambient_inflated":$inflated,"per_query":$detail}""")
    System.err.println(s"[bench] ${samples.size} runs, median total $total s (norm $totalNorm, inflated=$inflated); full spread in target/bench_runs_latest.json")
  }
}
