package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: the step AFTER pair detection (MinHash /
  * Jaccard / SimHash emit pairs; dedup needs the transitive CLUSTERS so
  * one survivor per group can be kept). Connected components via
  * iterative min-label propagation with a pointer-jump shortcut —
  * propagate the min label one edge-hop, then follow the freshly-assigned
  * label one more hop through the PREVIOUS round's labels. The shortcut
  * roughly halves surviving label-chain length each round, so long chains
  * converge in ~O(log diameter) rounds instead of O(diameter).
  *
  * Scale: no driver-side graph; each round materializes ONCE
  * (localCheckpoint) and the convergence check is a cheap scan of the
  * materialized round, so per-round cost is exactly the two joins + one
  * aggregation — nothing recomputes. */
object DupClusters {

  /** Symmetrized-edge-count bound under which the component labeling runs
    * as a driver-side union-find instead of the iterative join loop. A
    * near-dup edge set after thresholding is a tiny fraction of the corpus
    * (it lists the DUPLICATES, not the documents), so at gate scale the
    * iterative path spends seconds of per-round job overhead labeling a
    * few hundred edges. 2²⁰ symmetrized edges ≈ 16 MB of (Long, Long) —
    * the same order as Spark's own broadcast ceiling, and the count GATE
    * means a 100 TB corpus whose edge set is billions of rows takes the
    * distributed path untouched: this is a measured fallback, not a
    * driver-side assumption. */
  val SmallGraphEdgeBound: Long = 1L << 20

  /** `edges`: undirected pairs in columns (`a`, `b`). Returns
    * (`id`, `cluster`) where cluster = min id reachable from `id`;
    * every id appearing in any edge is labeled.
    *
    * `uniquePairs`: set true when the caller guarantees each undirected
    * pair appears once (all the dedup pair generators emit d1<d2 exactly
    * once) — the symmetrized edge set is then already duplicate-free and
    * the full-shuffle `distinct()` on the biggest table is skipped.
    * Duplicates would not affect correctness (min is idempotent), only
    * per-round join width. */
  def connectedComponents(edges: DataFrame,
                          uniquePairs: Boolean = false,
                          smallGraphBound: Long = SmallGraphEdgeBound): DataFrame = {
    val sym0 = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
    val sym = (if (uniquePairs) sym0 else sym0.distinct()).cache()
    // Small-graph fast path: one cached count decides. Long-typed ids only
    // (every house pair generator emits Long doc/vec ids); any other type
    // falls through to the type-generic iterative loop. The collect is
    // capped at [[Traceability.DriverProbeEdgeCap]] regardless of the
    // caller's bound (r11, same class as ADVICE r10 #2's Traceability
    // probe): a pathological smallGraphBound must degrade to the
    // distributed loop, never license a multi-gigabyte driver collect.
    val longIds = sym.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val driverBound = math.min(smallGraphBound, Traceability.DriverProbeEdgeCap)
    if (longIds && smallGraphBound > 0 && sym.count() <= driverBound) {
      val s = edges.sparkSession
      import s.implicits._
      val es = sym.as[(Long, Long)].collect()
      sym.unpersist()
      // Union by MIN root: the smaller root becomes parent, so each
      // component's root IS its minimum id — no relabeling pass needed.
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x0: Long): Long = {
        var root = x0
        while (parent.getOrElse(root, root) != root)
          root = parent.getOrElse(root, root)
        var x = x0 // path compression
        while (x != root) { val nxt = parent.getOrElse(x, x); parent(x) = root; x = nxt }
        root
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.iterator.map(_._1).toArray.distinct // sym carries both directions
      return s.createDataset(nodes.map(id => (id, find(id))).toSeq)
        .toDF("id", "cluster")
    }
    // Seed with the 1-hop minimum directly: the naive identity seed makes
    // round 1 a join against id->id labels, which computes exactly
    // min(id, min(neighbor)) — one groupBy gets the same labels without
    // the join, saving a full round of the loop.
    var labels = sym.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("cluster"))
      .select(col("a").as("id"), col("cluster"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      // hop 1: min label across direct neighbors
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid")).agg(min(col("cluster")).as("nbr_min"))
      val prop = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("c1"),
          col("cluster").as("c0"))
      // hop 2 (pointer jump): the label is itself a node id, so look up ITS
      // label from the already-materialized previous round — labels only
      // shrink within the reachable set, so least() stays a reachable min.
      val next0 = prop.join(
          labels.select(col("id").as("pid"), col("cluster").as("pc")),
          col("c1") === col("pid"), "left")
        .select(col("id"),
          least(col("c1"), coalesce(col("pc"), col("c1"))).as("cluster"),
          col("c0").as("prev"))
      // LAZY localCheckpoint: truncates the logical plan NOW (the round's
      // plan references the previous labels 3×, so without truncation the
      // plan grows 3^rounds and Catalyst itself OOMs on long chains) but
      // materializes inside the convergence-count job below — one pass per
      // round, where the eager variant paid a separate checkpoint job.
      val next = next0.localCheckpoint(false)
      changed = next.filter(col("cluster") < col("prev")).count()
      labels = next.select(col("id"), col("cluster"))
    }
    sym.unpersist()
    labels
  }
}
