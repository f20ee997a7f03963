package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DupClusters

/** End-to-end training-data curation pipeline — the composed form of the
  * individual operators (quality gate → exact dedup → near-dup cluster
  * dedup → per-language stats), showing the library as one coherent flow:
  *
  *   documents
  *     → quality filter (word-count band)
  *     → exact dedup (content hash, keep min doc_id)
  *     → near-dup clusters from caller-provided similarity pairs,
  *       keep the minimum doc per cluster
  *     → corpus stats per language
  *
  * Scale: every stage is a key-partitioned shuffle or map; the only
  * iteration (connected components) truncates lineage per round. The pair
  * source is pluggable — exact Jaccard here, MinHash candidates at 100 TB.
  */
object TrainingDataPipeline {

  /** How [[curate]] persists the exact-dedup survivors for its three
    * downstream consumers:
    *   - [[Cache]] (default) — executor storage via a lazy localCheckpoint
    *     (memory+disk blocks held by the returned plan, GC-reclaimed with
    *     it — r11 CacheHygieneSpec house rule; the pre-r11 `cache()` pinned
    *     CacheManager storage for the session's lifetime), right when the
    *     survivor set fits the cluster's memory+disk (gate/test scale).
    *     Honest trade vs the old `cache()`: localCheckpoint TRUNCATES
    *     lineage, so losing an executor that holds blocks (failure,
    *     dynamic-allocation decommission) fails the job instead of
    *     recomputing the partition — on long-lived clusters where that
    *     risk matters, use [[Checkpoint]], whose artifact re-reads are
    *     failure-proof AND release executor storage; that is the 100 TB
    *     mode regardless;
    *   - [[Checkpoint]] — a REAL checkpoint to the session's checkpoint
    *     dir (cheap storage at 100 TB: survivors are written once and
    *     re-read per consumer, nothing pins executor memory, and lineage
    *     truncates so failure recovery re-reads the artifact instead of
    *     recomputing the quality scan + dedup window). Requires
    *     `sparkContext.setCheckpointDir` — at scale an object-store path. */
  sealed trait CacheMode
  case object Cache extends CacheMode
  case object Checkpoint extends CacheMode

  /** `pairsOf`: computes near-duplicate edges (d1, d2) over the frame it
    * is given — it runs on the exact-dedup SURVIVORS so cluster
    * representatives are guaranteed to exist downstream. Each undirected
    * pair must appear exactly once (every house generator aggregates on
    * (d1 < d2), so this holds by construction) — clustering then skips a
    * full-shuffle distinct on the edge set. */
  def curate(documents: DataFrame, pairsOf: DataFrame => DataFrame,
             minWords: Int, maxWords: Int,
             cacheMode: CacheMode = Cache): DataFrame = {
    val nWords = size(split(col("text"), " "))
    val quality = documents.filter(nWords.between(minWords, maxWords))

    // Exact dedup as a keyed window (partitioned by the content hash —
    // never a global sort): ONE scan and one shuffle of the quality rows.
    // The alternative (narrow hash→min-id aggregation + doc_id semi-join)
    // scans the source twice for no fewer shuffles. Persisted because
    // three consumers follow (pair source, near-dup filter, stats); the
    // 100 TB path is `cacheMode = Checkpoint` (spec-exercised), not prose.
    val persisted = quality
      .withColumn("__h", md5(col("text")))
      .withColumn("__keep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col("doc_id") === col("__keep"))
      .drop("__h", "__keep")
    val exactSurvivors = cacheMode match {
      case Cache => persisted.transform(graft.FramePin.pin)
      case Checkpoint =>
        // persist → EAGER checkpoint → unpersist: a bare checkpoint()
        // recomputes the whole quality-scan + dedup-window lineage in the
        // checkpoint-write job (the documented RDD.checkpoint caveat), so
        // the survivors would be computed twice. With the persist, the
        // write job reads the just-cached blocks; the unpersist then
        // releases executor storage — downstream consumers read the
        // checkpoint FILES, which is the whole point of this mode.
        val p = persisted.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ck = p.checkpoint(eager = true)
        p.unpersist()
        ck
    }

    val clusters = DupClusters.connectedComponents(
      pairsOf(exactSurvivors).select(col("d1").as("a"), col("d2").as("b")),
      uniquePairs = true)
    val nearSurvivors = exactSurvivors
      .join(clusters, exactSurvivors("doc_id") === clusters("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .drop("id", "cluster")

    nearSurvivors
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        graft.queries.Parity.fr(
          sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_chars"))
  }

  /** The round-3 composed flow — the steps a corpus release runs AFTER
    * document-level dedup: pattern redaction (PII masking), paragraph-level
    * block dedup (corpus-wide boilerplate removal), repetition +
    * retained-token quality filtering, then the per-language mix report.
    * Composes the individually-gated q121/q119/q104 operators into ONE
    * plan:
    *
    *   documents
    *     → redact `pattern` globally (map)
    *     → drop word blocks whose block-hash appears in >1 document
    *       (one aggregation keyed by the 128-bit block hash)
    *     → keep docs with ≥ `minRetained` surviving tokens and a
    *       repeated-word ratio ≤ `maxRepRatio`
    *     → per-language kept-doc and kept-token totals
    *
    * Scale: the scrub is map-side; block df and the repetition signal are
    * key-partitioned aggregations; the final joins are doc_id-keyed. No
    * windows, no global sort, no driver state. */
  def curateV2(documents: DataFrame, pattern: String, blockWords: Long,
               minRetained: Long, maxRepRatio: Double): DataFrame = {
    // pinned: three consumers (block explosion, the repetition signal, and
    // the final doc_id/lang projection) — without it the regexp scrub +
    // tokenize scan runs once per branch; localCheckpoint so the blocks
    // are frame-scoped (r11 house rule)
    val withW = documents
      .select(col("doc_id"), col("lang"),
        split(regexp_replace(col("text"), pattern, "<ENTITY>"), " ").as("__w"))
      .withColumn("nw", size(col("__w")).cast("long"))
      .transform(graft.FramePin.pin)
    val blocks = withW
      .select(col("doc_id"), col("__w"), col("nw"),
        explode(sequence(lit(0L),
          floor((col("nw") - 1) / blockWords).cast("long"))).as("k"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("__w"),
          (col("k") * blockWords + 1).cast("int"), lit(blockWords.toInt)))).as("bh"),
        least(lit(blockWords), col("nw") - col("k") * blockWords).as("btok"))
      // consumed by the block-df aggregation AND the join probe
      .transform(graft.FramePin.pin)
    val dfc = blocks.groupBy(col("bh")).agg(countDistinct(col("doc_id")).as("df"))
    val retained = blocks.join(dfc, Seq("bh"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("df") === 1, col("btok")).otherwise(0L)).as("rtok"))
    val repetition = withW
      .select(col("doc_id"), explode(col("__w")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((lit(1.0) - count(lit(1)).cast("double") / sum(col("c"))).as("rr"))
    withW.select(col("doc_id"), col("lang"))
      .join(retained, Seq("doc_id")).join(repetition, Seq("doc_id"))
      .withColumn("kept",
        col("rtok") >= minRetained && col("rr") <= maxRepRatio)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("rtok")).otherwise(0L)).as("tokens_kept"))
      .orderBy(col("lang"))
  }
}
