package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive threshold-based prefix regrouping (SURVEY §2.7 O5, reference
  * `_regroup_lines_by_name_prefix` + its expand function,
  * account_report.py:3934-4065): when a sibling set has >= threshold lines,
  * they fold into one group line per first character (lowercased, sorted);
  * expanding a group re-applies the same rule on the NEXT character, so
  * grouping recurses while any group still exceeds the threshold (the
  * reference recurses lazily on unfold; this computes the fully-unfolded
  * tree, i.e. the print_mode/unfold_all rendering).
  *
  * Emission rule (provable from the reference's flow): prefix P of length L
  * is a group line iff count(items under P's parent prefix) >= threshold —
  * and since per-prefix counts are monotone non-increasing in prefix
  * length, the parent's own emission follows automatically.
  *
  * Scale posture: one groupBy per level, level L scoped to the previous
  * level's over-threshold groups via a broadcast semi-join (frontier is at
  * most N/threshold prefixes — display-threshold semantics keep it tiny).
  * The loop is bounded by the longest name and builds ONE lazy plan — no
  * per-level driver actions, no collect of item rows. */
object PrefixRegroup {

  /** `items` must have a string name column and a numeric value column.
    * Returns (p, lvl, n_lines, total): every group line of the fully
    * expanded prefix tree. Lines shorter than the current level stay
    * ungrouped (reference: appended as plain lines), so they count toward
    * their parent but never form deeper groups. */
  def recursiveGroups(items: DataFrame, nameCol: String, valueCol: String,
                      threshold: Int): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val it = items.select(lower(col(nameCol)).as("nm"), col(valueCol).as("v"))
      .cache()
    val spark = items.sparkSession
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lvl", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_lines", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("total", org.apache.spark.sql.types.DoubleType))))
    val head = it.agg(max(length(col("nm"))).as("ml"), count(lit(1)).as("n")).head()
    if (head.isNullAt(0) || head.getLong(1) < threshold) return empty
    val maxLen = head.getInt(0)

    // Each level is localCheckpoint-ed (materialized once, lineage cut):
    // level L's scope depends on level L-1's frontier, so a fully lazy
    // plan would re-execute the whole ancestry per level — O(depth²)
    // shuffles. Checkpointing makes it O(depth) small jobs, and lets the
    // loop stop as soon as the frontier drains (groups all below
    // threshold) instead of running to the longest name.
    var acc: DataFrame = null
    var frontier: DataFrame = null // null = root sibling set (all items)
    var lvl = 1
    var exhausted = false
    while (lvl <= maxLen && !exhausted) {
      val scoped =
        if (frontier == null) it
        else it.join(broadcast(frontier),
          substring(col("nm"), 1, lvl - 1) === col("p_prev")).drop("p_prev")
      val grp = scoped.filter(length(col("nm")) >= lvl)
        .groupBy(substring(col("nm"), 1, lvl).as("p"))
        .agg(count(lit(1)).as("n_lines"), sum(col("v")).as("total"))
        .withColumn("lvl", lit(lvl.toLong))
        .select("p", "lvl", "n_lines", "total")
        .localCheckpoint()
      acc = if (acc == null) grp else acc.unionByName(grp)
      frontier = grp.filter(col("n_lines") >= threshold)
        .select(col("p").as("p_prev"))
      exhausted = frontier.isEmpty
      lvl += 1
    }
    it.unpersist()
    if (acc == null) empty else acc
  }
}
