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
  * is a group line iff count(items under P's parent prefix) >= threshold.
  * Per-prefix counts are monotone non-increasing in prefix length, so if
  * the immediate parent is over threshold the whole ancestor chain is —
  * the immediate-parent check alone decides emission. That collapses the
  * reference's recursion into ONE declarative plan: explode every prefix
  * level of every name, aggregate (prefix, level) counts in a single
  * shuffle, and semi-join each prefix against its over-threshold parent.
  * No driver loop, no per-level jobs — at any scale this is two shuffles
  * (the level-explode aggregation and the parent check) regardless of tree
  * depth, where an iterative frontier walk pays a job per level. */
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

    // All (prefix, level) sibling-set sizes in one aggregation: a name of
    // length n contributes its n prefixes (explode factor = avg name
    // length, a small constant for display names).
    val cnt = it
      .select(col("nm"), col("v"),
        explode(sequence(lit(1), length(col("nm")))).as("lvl"))
      .groupBy(expr("substring(nm, 1, lvl)").as("p"),
        col("lvl").cast("long").as("lvl"))
      .agg(count(lit(1)).as("n_lines"), sum(col("v")).as("total"))

    // Root sibling set = the whole item list: level-1 groups exist iff the
    // corpus itself clears the threshold. Kept lazy as a 1-row broadcast so
    // the operator stays a single plan.
    val rootN = it.agg(count(lit(1)).as("__n_all"))

    // A deeper prefix is emitted iff its immediate parent group is over
    // threshold (monotonicity covers the rest of the chain).
    val parents = cnt.filter(col("n_lines") >= threshold)
      .select(col("p").as("__pp"), (col("lvl") + 1).as("__clvl"))

    val lvl1 = cnt.filter(col("lvl") === 1)
      .crossJoin(broadcast(rootN))
      .filter(col("__n_all") >= threshold)
      .drop("__n_all")
    val deeper = cnt.filter(col("lvl") > 1)
      .join(parents,
        expr("substring(p, 1, CAST(lvl AS INT) - 1)") === col("__pp") &&
          col("lvl") === col("__clvl"),
        "left_semi")

    lvl1.unionByName(deeper).select("p", "lvl", "n_lines", "total")
  }
}
