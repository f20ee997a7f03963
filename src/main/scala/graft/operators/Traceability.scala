package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lot/serial traceability (reference `stock.traceability.report`,
  * `etl_mrp/models/mrp.py:1089-1200` `_make_dict_move` — the recursive
  * upstream/downstream walk over linked stock moves, built there as a
  * Python recursion one record at a time; `etl_sale/models/serial.py`
  * walks the same move-line links for serial genealogy).
  *
  * Spark-first: breadth-first reachability over a directed edge table,
  * expanding ALL seeds' frontiers together — one equi-join shuffle per
  * hop, never a per-record walk. Depth is the hop count of the FIRST
  * reaching path (BFS ⇒ shortest), matching the report's level column.
  *
  * Scale: the frontier join is partitioned on the edge source; visited
  * state is a distributed DataFrame (never collected); each round is
  * localCheckpoint-ed so an N-hop trace builds an N-piece union, not an
  * N-deep lazy plan re-executed per round. */
object Traceability {

  /** `edges`: directed (`src`, `dst`). `seeds`: (`id`). Returns
    * (`root`, `node`, `depth`): every node reachable from each seed within
    * `maxHops`, with the shortest hop distance; seeds appear at depth 0.
    * Cycles are safe — a node is expanded once per root. */
  def reach(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // cached: the frontier join rereads the edge table every hop
    val e = edges.select(col("src"), col("dst")).cache()
    var visited = seeds.select(col("id").as("root"), col("id").as("node"),
      lit(0L).as("depth")).localCheckpoint(true)
    var frontier = visited
    var depth = 0L
    while (depth < maxHops && !frontier.isEmpty) {
      depth += 1
      // LAZY checkpoint: truncates lineage now, materializes inside the
      // loop-condition isEmpty — one job per hop instead of two
      frontier = frontier.join(e, frontier("node") === e("src"))
        .select(col("root"), col("dst").as("node"), lit(depth).as("depth"))
        .distinct()
        .join(visited.select(col("root").as("vr"), col("node").as("vn")),
          col("root") === col("vr") && col("node") === col("vn"), "left_anti")
        .localCheckpoint(false)
      visited = visited.unionByName(frontier)
    }
    // exit via depth == maxHops skips the isEmpty that would have
    // materialized the last lazy checkpoint — force it BEFORE dropping the
    // edge cache, or the caller's first action recomputes that hop uncached
    if (depth == maxHops) frontier.count(): Unit
    e.unpersist()
    visited
  }
}
