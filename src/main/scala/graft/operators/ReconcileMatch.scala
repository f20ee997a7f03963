package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bank-reconciliation matching suggestions (reference
  * etl_account/models/account_move_line.py:120-160: the amls widget's
  * receivable/payable dynamic filters match eligible move lines with
  * `amount_residual = st_line.amount`, eligibility = posted, not yet
  * reconciled): for every statement line, the candidate move lines with
  * exactly the residual it needs, classified receivable (inbound) or
  * payable (outbound) by the line's sign, reduced to the best suggestion
  * (min move-line id — the reference shows candidates id-ordered).
  *
  * Spark-first: ONE equi-join on the amount value replaces the reference's
  * per-line widget query; suggestions for every open statement line
  * materialize in a single pass. Scale: the join key is the amount
  * (well-distributed for money values); per-line candidate sets stay
  * small, and the best-pick is a map-side-combinable min aggregation, not
  * a window. */
object ReconcileMatch {

  /** `stLines`: (`line_id`, `amount`). `moveLines`: (`aml_id`,
    * `residual`, `reconciled` bool). Returns per matched statement line:
    * (line_id, amount, match_class, n_candidates, best_aml). */
  def suggest(stLines: DataFrame, moveLines: DataFrame): DataFrame = {
    val eligible = moveLines.filter(!col("reconciled"))
      .select(col("aml_id"), col("residual"))
    stLines.join(eligible, col("residual") === col("amount"))
      .groupBy(col("line_id"), col("amount"))
      .agg(count(lit(1)).as("n_candidates"), min(col("aml_id")).as("best_aml"))
      .withColumn("match_class",
        when(col("amount") > 0, "receivable_matching").otherwise("payable_matching"))
      .select(col("line_id"), col("amount"), col("match_class"),
        col("n_candidates"), col("best_aml"))
  }
}
