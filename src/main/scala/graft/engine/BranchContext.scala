package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-branch row-level security (SURVEY §2.2 P4): the reference injects
  * a `branch_id` filter into every `_search`/`_read_group`
  * (branch/models/account_move.py:31-51,85-108,
  * etl_sale/models/serial.py:211-240) so users only ever see their allowed
  * branches.
  *
  * Spark-first: a context object applied at the scan wrapper — the filter
  * is an ordinary pushed-down predicate, so partition pruning on a
  * branch-partitioned table skips entire directories at 100 TB. */
final case class BranchContext(allowed: Seq[Long], branchCol: String = "branch_id") {

  /** Rows without a branch are ALWAYS visible — the reference injects
    * `['|', (branch_id, '=', False), (branch_id, 'in', branch_ids)]`
    * (branch/models/account_move.py:38-39) even for a user with no
    * branches, so a NULL branch never hides data. */
  def predicate: Column =
    col(branchCol).isNull || col(branchCol).isin(allowed: _*)

  /** Apply to a scan. No-op for tables without the branch dimension. */
  def apply(df: DataFrame): DataFrame =
    if (df.columns.contains(branchCol)) df.filter(predicate) else df
}
