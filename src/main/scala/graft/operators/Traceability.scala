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
  * N-deep lazy plan re-executed per round. Small graphs (probe-gated, see
  * [[SmallGraphEdgeBound]]) run as a driver-side BFS instead — a
  * traceability trace is usually a filtered lot/serial subgraph, and the
  * iterative path spends a join-round of job overhead per hop on data a
  * single thread walks in milliseconds. */
object Traceability {

  /** Edge count at or under which the walk runs on the driver: 2¹⁸ edges
    * ≈ 4 MB of (Long, Long) — a filtered trace subgraph, not a fact
    * table. A bounded limit-probe decides (stops scanning at bound+1
    * rows), so a 100 TB move graph takes the distributed loop after a
    * truncated probe, never a full collect. */
  val SmallGraphEdgeBound: Long = 1L << 18

  /** Distinct-seed cap for the driver path (the result is one BFS tree
    * per seed, so its size scales with the seed count). */
  val SmallSeedBound: Long = 1024L

  /** Result-row cap for the driver path: if the accumulated BFS output
    * exceeds this, the driver walk is abandoned and the distributed loop
    * runs instead — the gate is on OBSERVED output, not a prediction. */
  val SmallResultBound: Long = 1L << 20

  /** Hard cap on the driver-path PROBE, regardless of how large a
    * `smallGraphBound` the caller passes (r11, ADVICE r10 #2): the r10
    * Int.MaxValue clamp fixed the negative-limit overflow but left a
    * pathological bound able to pull ~2³¹ edge tuples onto the driver
    * before the distributed fallback was chosen. 2²² edges collected as an
    * `Array[(Long, Long)]` cost ~170 MB on the driver (≈ 40 B per boxed
    * tuple + slot reference, not the 16 B payload alone) — already 16× the
    * default [[SmallGraphEdgeBound]] and a comfortable fraction of the
    * smallest plausible driver heap; no legitimate driver walk wants
    * more, so a larger bound degrades to
    * "driver path iff the graph fits under this cap" and a graph past it
    * takes the distributed loop after a truncated probe. */
  val DriverProbeEdgeCap: Long = 1L << 22

  /** `edges`: directed (`src`, `dst`). `seeds`: (`id`). Returns
    * (`root`, `node`, `depth`): every node reachable from each seed within
    * `maxHops`, with the shortest hop distance; seeds appear at depth 0.
    * Cycles are safe — a node is expanded once per root. */
  def reach(edges: DataFrame, seeds: DataFrame, maxHops: Int,
            smallGraphBound: Long = SmallGraphEdgeBound): DataFrame = {
    val eSel = edges.select(col("src"), col("dst"))
    val longTyped = (eSel.schema.fields :+ seeds.schema("id"))
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (longTyped && smallGraphBound > 0) {
      val s = edges.sparkSession
      import s.implicits._
      // ONE bounded job probes the edge count AND lands the edges when the
      // graph is small (the old cache+count+collect spent three jobs and a
      // cache materialization on the same decision — r8 bench showed that
      // overhead IS most of the gate at trace scale). limit(bound+1) stops
      // scanning once the bound is disproven, so a fact-scale graph pays a
      // truncated probe, never a full collect.
      // clamped to [[DriverProbeEdgeCap]] (r11, ADVICE r10 #2 — the r10
      // Int.MaxValue clamp only fixed the negative-limit overflow; the
      // probe itself must stay driver-sized, clamp BEFORE the +1 so
      // bound = Long.MaxValue cannot wrap). The small path is taken only
      // when the probe came back UNDER its own limit (length < probeN): a
      // full probe proves "at least probeN rows", which disproves an
      // unclamped bound exactly and leaves a clamped bound unverifiable —
      // either way the distributed loop is the correct (and for the
      // clamped case, conservative) choice, never a driver walk over a
      // silently truncated edge set or a ~2³¹-row driver collect.
      val probeN = math.min(smallGraphBound, DriverProbeEdgeCap).toInt + 1
      val probe = eSel.limit(probeN).as[(Long, Long)].collect()
      if (probe.length < probeN) {
        val seedIds = seeds.select(col("id")).distinct()
          .limit((SmallSeedBound + 1).toInt).as[Long].collect()
        if (seedIds.length <= SmallSeedBound) {
          val adj = scala.collection.mutable.LongMap
            .empty[scala.collection.mutable.ArrayBuffer[Long]]
          probe.foreach { case (a, b) =>
            adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var overflow = false
          for (root <- seedIds if !overflow) {
            val depthOf = scala.collection.mutable.LongMap.empty[Long]
            var frontier = List(root)
            depthOf(root) = 0L
            out += ((root, root, 0L))
            var d = 0L
            while (d < maxHops && frontier.nonEmpty && !overflow) {
              d += 1
              val next = scala.collection.mutable.ListBuffer.empty[Long]
              for (n <- frontier; m <- adj.getOrElse(n, Nil)
                   if !depthOf.contains(m)) {
                depthOf(m) = d
                out += ((root, m, d))
                next += m
              }
              if (out.size > SmallResultBound) overflow = true
              frontier = next.toList
            }
          }
          if (!overflow)
            return s.createDataset(out.toSeq).toDF("root", "node", "depth")
          // fall through: result larger than the driver should hold
        }
      }
    }
    // cached: the frontier join rereads the edge table every hop
    val e = eSel.cache()
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
