package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of the incremental batch-vs-corpus exact dedup (q108's
  * exact arm, [[graft.queries.CurationOps]]): an arriving DOCUMENT STREAM
  * is classified against the already-ingested corpus — `exact_dup` if the
  * content hash was ever seen (in the seeded corpus or earlier in the
  * stream), `unique` otherwise, in which case the hash is added to state
  * so later arrivals of the same content dedup against it.
  *
  * Spark-first shape: `transformWithState` keyed by the content hash with
  * INITIAL STATE — the corpus hash set is loaded into the state store by
  * the runtime at query start (one distributed pass, grouped by the same
  * key the stream shuffles on), so steady-state processing touches only
  * the state-store partitions of arriving hashes; there is no per-batch
  * join against a growing corpus table and nothing on the driver.
  *
  * State size: ONE boolean per distinct content hash (the key itself is
  * the 32-hex md5) — ~50 bytes/doc in RocksDB, i.e. ~50 GB of state per
  * billion documents, spread across executors. The TTL hook is the knob a
  * deployment would use to bound it ([[TTLConfig]] stays NONE here: dedup
  * state must not expire while the corpus is live). */
object DedupStream {

  /** One arriving document: `h` = content hash (grouping key), `doc_id`. */
  final case class DocIn(h: String, doc_id: Long)
  final case class DedupOut(doc_id: Long, h: String, dedup_class: String)

  final class DedupProcessor
      extends StatefulProcessorWithInitialState[String, DocIn, DedupOut, String] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig.NONE)
    override def handleInitialState(key: String, initialState: String,
                                    timerValues: TimerValues): Unit =
      seen.update(true)
    override def handleInputRows(key: String, rows: Iterator[DocIn],
                                 timerValues: TimerValues): Iterator[DedupOut] = {
      // sort by doc_id: the iterator's inter-partition arrival order is
      // arbitrary, so "which duplicate counts as first" must be pinned —
      // smallest doc_id wins, same as the batch exact-dedup gates. The
      // sort is bounded: same-hash arrivals within ONE micro-batch.
      val out = scala.collection.mutable.ListBuffer[DedupOut]()
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        val dup = seen.exists()
        if (!dup) seen.update(true)
        out += DedupOut(d.doc_id, d.h, if (dup) "exact_dup" else "unique")
      }
      out.iterator
    }
  }

  /** `stream`: arriving docs (h, doc_id), typically
    * `md5(text)` computed upstream. `corpusHashes`: the existing corpus's
    * distinct content hashes (batch Dataset — becomes initial state).
    * Output: (doc_id, h, dedup_class) per arriving doc. Within one
    * micro-batch, the SMALLEST doc_id of a new hash is `unique` and the
    * rest `exact_dup` (arrival order across source partitions is not
    * deterministic, so the winner is pinned by id). */
  def classify(stream: Dataset[DocIn],
               corpusHashes: Dataset[String]): Dataset[DedupOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .groupByKey(_.h)
      .transformWithState(new DedupProcessor,
        TimeMode.None(), OutputMode.Append(),
        corpusHashes.groupByKey(identity))
  }
}
