package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: the step AFTER pair detection (MinHash /
  * Jaccard / SimHash emit pairs; dedup needs the transitive CLUSTERS so
  * one survivor per group can be kept). Connected components via
  * iterative min-label propagation — the standard large-graph formulation
  * (converges in O(component diameter) rounds, each round one shuffle).
  *
  * Scale: no driver-side graph; per-round lineage is truncated with
  * localCheckpoint so 100-round graphs don't build 100-deep plans. The
  * driver only sees one `count` per round (the convergence check). */
object DupClusters {

  /** `edges`: undirected pairs in columns (`a`, `b`). Returns
    * (`id`, `cluster`) where cluster = min id reachable from `id`;
    * every id appearing in any edge is labeled. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id")).localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid")).agg(min(col("cluster")).as("nbr_min"))
      val next = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("next_cluster"),
          col("cluster"))
      changed = next.filter(col("next_cluster") < col("cluster")).count()
      labels = next.select(col("id"), col("next_cluster").as("cluster"))
        .localCheckpoint(true)
    }
    sym.unpersist()
    labels
  }
}
