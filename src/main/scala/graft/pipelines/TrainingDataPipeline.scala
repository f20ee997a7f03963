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

  /** `pairsOf`: computes near-duplicate edges (d1, d2) over the frame it
    * is given — it runs on the exact-dedup SURVIVORS so cluster
    * representatives are guaranteed to exist downstream. */
  def curate(documents: DataFrame, pairsOf: DataFrame => DataFrame,
             minWords: Int, maxWords: Int): DataFrame = {
    val nWords = size(split(col("text"), " "))
    val quality = documents.filter(nWords.between(minWords, maxWords))

    // Exact dedup as a keyed window (partitioned by the content hash —
    // never a global sort): ONE scan and one shuffle of the quality rows.
    // The alternative (narrow hash→min-id aggregation + doc_id semi-join)
    // scans the source twice for no fewer shuffles. Cached because three
    // consumers follow (pair source, near-dup filter, stats); at 100 TB
    // swap the cache for a checkpoint to cheap storage.
    val exactSurvivors = quality
      .withColumn("__h", md5(col("text")))
      .withColumn("__keep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col("doc_id") === col("__keep"))
      .drop("__h", "__keep")
      .cache()

    val clusters = DupClusters.connectedComponents(
      pairsOf(exactSurvivors).select(col("d1").as("a"), col("d2").as("b")))
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
}
