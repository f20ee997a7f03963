package graft

/** Per-process scratch root for gate fixtures (q67 CSV, q106 JSONL).
  *
  * The fixture gates materialize a tiny dim-table file to exercise the
  * ingestion sources; the path must not be a fixed literal or two
  * concurrent runs (bench + verify, or two Verify invocations) would
  * clobber each other's fixture mid-read. Overridable via
  * SPARK_GRAFT_SCRATCH; the default embeds the JVM pid so concurrent
  * processes get disjoint roots. Fact-sized data must never go through
  * this path — it is driver-side PrintWriter territory, dim tables only.
  */
object Scratch {
  private lazy val base: String = {
    val b = sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      s"/root/repo/target/scratch-${ProcessHandle.current().pid()}")
    // the pid default is unique per process, so nothing else ever reuses
    // it — remove it at exit or target/ accrues one orphan dir per run
    if (!sys.env.contains("SPARK_GRAFT_SCRATCH"))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRec(new java.io.File(b))))
    b
  }

  /** A fresh, empty scratch subdirectory (recreated on every call). */
  def fresh(sub: String): java.io.File = {
    val f = new java.io.File(base, sub)
    deleteRec(f); f.mkdirs()
    f
  }

  def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
