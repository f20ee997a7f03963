package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool (r11, VERDICT r10 next-list #3): attribute the
  * probe-AMPLIFIED gates. Between two same-code r10 windows whose CPU
  * probe moved 1.14×, three gates moved 1.36–1.42× — q143_dsir_weights,
  * q150_selection_pipeline, q162_incremental_index — i.e. they are bound
  * by a resource neither probe arm brackets. Hypothesis: memory
  * bandwidth (all three stream wide exploded intermediates through
  * hash aggregations), not ALU or scratch I/O.
  *
  * The A/B: run the trio plus two compute controls under three induced
  * conditions in ONE session —
  *   - `quiet`  — no induced load;
  *   - `cpu`    — N ALU-bound xorshift threads (registers only, ~zero
  *                memory traffic): what the CPU probe arm senses;
  *   - `membw`  — N streaming-sum threads over 64 MiB arrays at
  *                cache-line stride (pure memory-bandwidth pressure,
  *                near-zero ALU occupancy per byte).
  * Each condition also measures the CPU probe and a MEMORY-BANDWIDTH
  * probe inside the window. If the trio inflates under `membw` well past
  * the CPU probe's own factor while the controls track the probe, the
  * amplification class is memory bandwidth — recorded in BASELINE.md so
  * future cross-window reads stop flagging these gates as code movers.
  *
  * Emits `target/amplify.json` (committed per-round as
  * `AMPLIFY_r{N}.json`). Run it ALONE on the host — its whole point is
  * controlled induced load. */
object AmplifyProbe {

  private val sink = new java.util.concurrent.atomic.AtomicLong()

  /** One arm's running stressor: each start gets its OWN halt flag,
    * captured by its threads (r11 review: with one shared mutable flag, a
    * thread that outlived stopStressor's bounded join would be silently
    * REVIVED by the next arm's `halt = false` and contaminate every
    * later condition — exactly the oversubscribed regime this tool
    * induces). */
  private final case class Stressor(
      halt: java.util.concurrent.atomic.AtomicBoolean, threads: Seq[Thread])

  private def startStressor(kind: String, threads: Int): Stressor = {
    val halt = new java.util.concurrent.atomic.AtomicBoolean(false)
    Stressor(halt, (0 until threads).map { t =>
      val th = new Thread(() => {
        kind match {
          case "cpu" =>
            var x = 0x9E3779B97F4A7C15L + t
            while (!halt.get()) {
              var i = 0
              while (i < (1 << 20)) {
                x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
                x *= 0x2545F4914F6CDD1DL
                i += 1
              }
            }
            sink.addAndGet(x): Unit
          case "membw" =>
            val arr = new Array[Long](1 << 23) // 64 MiB of longs
            java.util.Arrays.fill(arr, 0x5EEDL + t)
            var s = 0L
            while (!halt.get()) {
              var i = 0
              while (i < arr.length) { s += arr(i); i += 8 } // 64 B stride
            }
            sink.addAndGet(s): Unit
          case "gcchurn" =>
            // allocation churn in the SAME JVM as the Spark session: the
            // stressor arm for the shared-GC hypothesis. Short-lived 64 KiB
            // arrays at full speed press young-gen collection frequency —
            // near-zero steady ALU and DRAM footprint, pure allocator/GC
            // pressure, which neither of the other arms exerts.
            var s = 0L
            while (!halt.get()) {
              val a = new Array[Long](8192)
              a(s.toInt & 8191) = s
              s += a.length
            }
            sink.addAndGet(s): Unit
        }
      })
      th.setDaemon(true); th.start(); th
    })
  }

  /** Halts and joins the arm's threads; a thread still alive after the
    * bounded join can never restart (its flag stays set forever), but it
    * WOULD contaminate the following conditions — so that run is loudly
    * invalidated rather than recorded. */
  private def stopStressor(st: Stressor): Unit = {
    st.halt.set(true)
    st.threads.foreach(_.join(10000))
    val alive = st.threads.count(_.isAlive)
    if (alive > 0)
      sys.error(s"[amplify] $alive stressor thread(s) survived the 10 s " +
        "join — subsequent conditions would be contaminated; aborting")
  }

  /** The bench's own CPU arm at probe weight (¼ of the bench's step
    * count) — ONE kernel (`Bench.calibrationProbe`), so this arm cannot
    * drift from the one the bench artifacts cite. */
  private def cpuProbe(): Double = Bench.calibrationProbe(100000000L)

  /** 8 threads × 16 cache-line-stride passes over private 64 MiB arrays
    * (8 GiB of DRAM traffic): wall seconds scale inversely with the
    * bandwidth the window leaves available. */
  private def membwProbe(): Double = {
    val threads = 8
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        val arr = new Array[Long](1 << 23)
        java.util.Arrays.fill(arr, 0x5EEDL + t)
        var s = 0L; var pass = 0
        while (pass < 16) {
          var i = 0
          while (i < arr.length) { s += arr(i); i += 8 }
          pass += 1
        }
        sink.addAndGet(s): Unit
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the bench-child width: induced load must compete with the SAME
    // parallelism the suite runs at, or a narrow session just slides into
    // the stressor-free cores and measures nothing (the first cut ran
    // local[4] on the 32-vCPU host and saw zero gate movement)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stressorThreads =
      sys.env.getOrElse("SPARK_GRAFT_STRESS_THREADS", "16").toInt
    val samples = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY_RUNS", "5").toInt
    val trio = Seq("q143_dsir_weights", "q150_selection_pipeline",
      "q162_incremental_index")
    val controls = Seq("q84_tfidf_topterms", "q75_sessionize")
    val gates = trio ++ controls
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Scratch.benchLocalDir().foreach(d => b.config("spark.local.dir", d))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm codegen/scan/JIT fully before ANY condition is timed: the first
    // cut warmed each gate once and the residual JIT drift (gates still
    // speeding up run-over-run) swamped the induced-load signal. Two full
    // passes of every gate plus one exercise of each probe kind, so the
    // per-condition numbers compare CONDITIONS, not warm-up states.
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    (1 to 2).foreach { _ =>
      gates.foreach { g =>
        SparkEntry.queries(g)(spark, sfDir).count()
        spark.catalog.clearCache(); System.gc()
      }
    }
    cpuProbe(); membwProbe()
    val out = new StringBuilder
    out.append("{\"sf\":\"").append(sfDir)
      .append("\",\"written_utc\":\"").append(java.time.Instant.now())
      .append("\",\"stressor_threads\":").append(stressorThreads)
      .append(",\"spark_cpus\":").append(cpus)
      .append(",\"samples_per_gate\":").append(samples)
      .append(",\"conditions\":{")
    // INTERLEAVED quiet brackets (second redesign): the first two cuts
    // showed monotone same-session JVM warming (quiet→quiet2 drift 8–19 %)
    // large enough to masquerade as — or cancel — a load response when
    // conditions run back-to-back. Each loaded condition is therefore
    // compared to the MEAN of its two bracketing quiets, not to one global
    // quiet. `gcchurn` is the third arm: same-JVM allocation pressure,
    // the one shared resource the CPU and DRAM arms don't press.
    val conds = Seq("quiet1", "cpu", "quiet2", "membw", "quiet3",
      "gcchurn", "quiet4")
    conds.zipWithIndex.foreach { case (cond, ci) =>
      val ts = if (cond.startsWith("quiet")) None
        else Some(startStressor(cond, stressorThreads))
      try {
        val pc = cpuProbe(); val pm = membwProbe()
        val rows = gates.map { g =>
          val xs = (1 to samples).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(g)(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache(); System.gc()
            dt
          }
          s""""$g":[${xs.map(x => f"$x%.3f").mkString(",")}]"""
        }
        // probes re-read AFTER the gates: min-bracket, same as the bench
        val pc2 = cpuProbe(); val pm2 = membwProbe()
        if (ci > 0) out.append(",")
        out.append(s""""$cond":{"probe_cpu_sec":${f"${math.min(pc, pc2)}%.3f"},"probe_membw_sec":${f"${math.min(pm, pm2)}%.3f"},"gates":{${rows.mkString(",")}}}""")
        System.err.println(s"[amplify] $cond done (cpu ${math.min(pc, pc2)}, membw ${math.min(pm, pm2)})")
      } finally ts.foreach(stopStressor)
    }
    out.append("}}")
    spark.stop()
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/amplify.json"), out.toString)
    println(out.toString)
  }
}
