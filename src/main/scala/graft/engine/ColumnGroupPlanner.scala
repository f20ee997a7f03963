package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-period / multi-variant evaluation (SURVEY §2.4 A14/A17): the
  * reference evaluates each report column group (comparison period ×
  * horizontal group, account_report.py:1193-1290) as a separate SQL query
  * and UNION ALLs the results (account_general_ledger.py:223-290).
  *
  * Spark-first rewrite: ONE scan with per-group conditional aggregates —
  * `sum(when(groupPredicate, measure))` per group — so N comparison periods
  * cost one pass over the 100-TB fact instead of N (SURVEY §4.1 "formula
  * batching"). This is the planner-level optimization the reference could
  * not do across its SQL strings.
  */
object ColumnGroupPlanner {

  /** A column group: a label and the predicate (usually a DateScope +
    * forced domain) that scopes the fact rows belonging to it. */
  final case class Group(key: String, predicate: Column)

  /** Evaluate `measures` (name -> row-level measure column) for every group
    * in a single scan. Output: one row per `keys` combination, one column
    * `<group>_<measure>` per (group, measure). Rows not matching any group
    * are filtered out before the shuffle. */
  def evaluate(fact: DataFrame, keys: Seq[Column], groups: Seq[Group],
               measures: Map[String, Column],
               finisher: Column => Column = identity): DataFrame = {
    val anyGroup = groups.map(_.predicate).reduce(_ || _)
    val aggs = for {
      g <- groups
      (mName, m) <- measures.toSeq
    } yield finisher(sum(when(g.predicate, m).otherwise(lit(0.0)))).as(s"${g.key}_$mName")
    fact.filter(anyGroup).groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
