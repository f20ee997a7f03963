package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the Bloom corpus screen
  * ([[graft.queries.SelectionOps.q144]] is the batch gate): the corpus
  * bitmap lives on the driver (bounded by m/64 words — 4 KiB at the gate's
  * 2^18 bits, megabytes at production sizes), every micro-batch is screened
  * against the bitmap AS OF the previous batch, then its own positions are
  * OR-folded in for the next batch.
  *
  * Why a Bloom and not the exact-set state of [[DedupStream]]: the OR-fold
  * is IDEMPOTENT, so at-least-once foreachBatch replay needs no version
  * bookkeeping at all (re-OR-ing a replayed batch is a no-op — contrast
  * [[EventsStream.maintainAggregate]]'s `latestVersionBefore` machinery),
  * and the state size is fixed up front instead of growing with the
  * corpus. The price is one-sided error: a hit may be false, a miss never
  * is — the screen's contract, same as the batch gate.
  *
  * Scale: screening is a distributed map over the batch with the bitmap
  * BROADCAST (the documents never leave the executors); the only driver
  * work per batch is OR-ing the batch's DISTINCT positions — bounded by
  * m, not by batch size. */
object BloomStream {

  /** `h`: the portable content/block hash ([[graft.queries.Parity.strHash]]
    * shape); `doc_id`: the document the hash came from. */
  case class DocIn(h: Long, doc_id: Long)
  case class ScreenOut(doc_id: Long, bloom_hit: Boolean)

  /** Same double-hashing position math as the q144 gate (Kirsch–
    * Mitzenmacher): position_j = (h mod m + j·(1 + h mod (m−1))) mod m. */
  def positions(h: Long, m: Long, k: Int): Seq[Long] = {
    val h1 = h % m
    val h2 = 1L + h % (m - 1)
    (0 until k).map(j => (h1 + j * h2) % m)
  }

  /** A fixed-size bit array with idempotent OR-fold — the driver-held
    * streaming state. */
  final class Bitmap(val bits: Long) {
    val words = new Array[Long]((bits / 64).toInt)
    def set(p: Long): Unit = words((p / 64).toInt) |= (1L << (p % 64))
    def test(p: Long): Boolean =
      ((words((p / 64).toInt) >>> (p % 64)) & 1L) == 1L
    def snapshot: Array[Long] = words.clone()
  }

  /** Start the screen: each micro-batch of `src` is classified against the
    * bitmap state BEFORE the batch (batch granularity — a doc's own
    * batch-mates don't mark it; [[DedupStream]] gives row granularity),
    * the classified batch goes to `sink` (production: a parquet append;
    * tests: a collect), and the batch's positions fold into the bitmap.
    * `bitmap` may be pre-seeded from a frozen corpus (the q144 shape). */
  def screen(src: Dataset[DocIn], bitmap: Bitmap, m: Long, k: Int,
      sink: Dataset[ScreenOut] => Unit): StreamingQuery = {
    src.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[DocIn], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val kk = k
        val mm = m
        // DISTRIBUTED screen against the broadcast pre-batch bitmap
        val pre = spark.sparkContext.broadcast(bitmap.snapshot)
        val classified = batch.map { r =>
          val hit = positions(r.h, mm, kk).forall { p =>
            ((pre.value((p / 64).toInt) >>> (p % 64)) & 1L) == 1L
          }
          ScreenOut(r.doc_id, hit)
        }
        sink(classified)
        // bounded driver fold: ≤ m distinct positions, idempotent —
        // replaying this whole batch is a no-op
        batch.select(explode(typedLit((0 until kk).toList)).as("j"), col("h"))
          .select(((col("h") % mm) + col("j") * (lit(1L) + col("h") % (mm - 1))) % mm)
          .distinct().collect().foreach(r => bitmap.set(r.getLong(0)))
        ()
    }.start()
  }
}
