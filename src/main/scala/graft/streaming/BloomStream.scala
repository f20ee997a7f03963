package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the Bloom corpus screen
  * ([[graft.queries.SelectionOps.q144]] is the batch gate): the corpus
  * bitmap lives on the driver (bounded by m/64 words — 4 KiB at the gate's
  * 2^18 bits, megabytes at production sizes), every micro-batch is screened
  * against the bitmap AS OF the start of the batch, then its own positions
  * are OR-folded in for the next batch.
  *
  * Why a Bloom and not the exact-set state of [[DedupStream]]: the OR-fold
  * is IDEMPOTENT and the state size is fixed up front instead of growing
  * with the corpus. The price is one-sided error: a hit may be false, a
  * miss never is — the screen's contract, same as the batch gate.
  *
  * Replay semantics: the pre-batch snapshot is PINNED per batchId, so an
  * in-process foreachBatch retry of the same batch re-screens against the
  * identical snapshot (same classifications) and its re-fold is a no-op —
  * no version bookkeeping à la [[EventsStream.maintainAggregate]] needed.
  * Across a DRIVER RESTART the in-memory bitmap is gone by design: the
  * deployment contract is to re-seed from the released corpus at startup
  * (one scan rebuilds the bitmap — that cheap rebuild is exactly why
  * production dedup screens favor Blooms over exact sets) and resume the
  * source from the checkpoint passed to [[screen]].
  *
  * Scale: screening is a distributed map over the batch with the bitmap
  * BROADCAST (the documents never leave the executors); the only driver
  * work per batch is OR-ing the batch's DISTINCT positions — bounded by
  * m, not by batch size. */
object BloomStream {

  /** `h`: the content/block hash — ANY long, negative accepted (the
    * position math floor-mods); `doc_id`: the document it came from. */
  case class DocIn(h: Long, doc_id: Long)
  case class ScreenOut(doc_id: Long, bloom_hit: Boolean)

  /** Same double-hashing position shape as the q144 gate (Kirsch–
    * Mitzenmacher): position_j = (h1 + j·h2) mod m, with floor-mod so any
    * Long hash yields positions in [0, m) and h2 in [1, m−1] (never 0 —
    * a zero stride would collapse all k probes onto one bit). The single
    * source of the math: the executor probe and the driver fold both call
    * this (the q144 COLUMN twin feeds only the non-negative
    * [[graft.queries.Parity.strHash]], where % and floorMod agree). */
  def positions(h: Long, m: Long, k: Int): Seq[Long] = {
    val h1 = java.lang.Math.floorMod(h, m)
    val h2 = 1L + java.lang.Math.floorMod(h, m - 1)
    (0 until k).map(j => (h1 + j * h2) % m)
  }

  /** [[positions]] as column expressions — the ONE column-side source of
    * the double-hash math (the q144/q161 batch and fixture twins build
    * their bit positions from this). Uses `%`, so callers must feed a
    * NON-NEGATIVE hash (e.g. Parity.strHash), where `%` and the row-side
    * floor-mod agree. */
  def positionCols(h: org.apache.spark.sql.Column, m: Long, k: Int)
      : Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.lit
    val h1 = h % m
    val h2 = lit(1L) + h % (m - 1)
    (0 until k).map(j => (h1 + lit(j.toLong) * h2) % m)
  }

  /** A fixed-size bit array with idempotent OR-fold — the driver-held
    * streaming state. Word count rounds UP so a non-multiple-of-64 size
    * cannot under-allocate the last partial word. */
  final class Bitmap(val bits: Long) {
    require(bits >= 2, s"a $bits-bit bloom cannot carry a nonzero stride")
    val words = new Array[Long](((bits + 63) / 64).toInt)
    def set(p: Long): Unit = words((p / 64).toInt) |= (1L << (p % 64))
    def test(p: Long): Boolean =
      ((words((p / 64).toInt) >>> (p % 64)) & 1L) == 1L
    def snapshot: Array[Long] = words.clone()

    // The replay pin lives WITH the state, not with a screen() call: a
    // foreachBatch failure terminates the query, and recovery re-invokes
    // screen() over the SAME Bitmap — per-call vars would re-snapshot
    // AFTER the failed batch's fold and flip its classifications on
    // replay. (A recovery that instead re-seeds a FRESH bitmap discards
    // the fold state together with the pin — consistent by construction.)
    private var pinnedBatch = -1L
    private var pinned: Array[Long] = null
    /** The pre-batch snapshot for `batchId`, pinned on first sight so a
      * replay of the same batch re-screens against identical bits. */
    def snapshotFor(batchId: Long): Array[Long] = synchronized {
      if (batchId != pinnedBatch) { pinned = snapshot; pinnedBatch = batchId }
      pinned
    }
  }

  /** Start the screen: each micro-batch of `src` is classified against the
    * bitmap state at the START of the batch (batch granularity — a doc's
    * own batch-mates don't mark it; [[DedupStream]] gives row
    * granularity), the classified batch goes to `sink` (production: a
    * parquet append; tests: a collect), and the batch's positions fold
    * into the bitmap. `bitmap` is pre-seeded from the frozen corpus (the
    * q144 shape); positions are derived with `bitmap.bits` as m, so the
    * screen can never index outside the state. */
  def screen(src: Dataset[DocIn], bitmap: Bitmap, k: Int,
      sink: Dataset[ScreenOut] => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val m = bitmap.bits
    val writer = src.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[DocIn], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val kk = k
        val mm = m
        batch.persist() // two jobs below (screen + fold): read source once
        try {
          // pre-batch snapshot pinned per batchId INSIDE the bitmap — a
          // replayed batch re-screens against its original bits even when
          // recovery went through a fresh screen() call (see Bitmap)
          val pre = spark.sparkContext.broadcast(bitmap.snapshotFor(batchId))
          try {
            val classified = batch.map { r =>
              val hit = positions(r.h, mm, kk).forall { p =>
                ((pre.value((p / 64).toInt) >>> (p % 64)) & 1L) == 1L
              }
              ScreenOut(r.doc_id, hit)
            }
            sink(classified)
            // bounded driver fold: ≤ m distinct positions, idempotent
            batch.flatMap(r => positions(r.h, mm, kk))
              .distinct().collect().foreach(bitmap.set)
          } finally pre.unpersist(blocking = false)
        } finally batch.unpersist()
        ()
    }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
