package graft.registers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wizard-register pipelines (SURVEY §3.3): the reference's batch registers
  * (sales/purchase/credit-note, etl_account/wizard/sales_report.py:44-237;
  * HSN summary hsn_report.py:80-200) scan → filter → pivot tax groups into
  * rate columns → append running grand totals → write. Spark-first each
  * register is one DataFrame pipeline: filter → join dims → `pivot` →
  * union a grand-total row → sort. */
object Registers {

  /** Generic register: per-`groupCol` rows with `pivotCol` fanned into one
    * amount column per pivot value (explicit value list ⇒ deterministic
    * schema, single scan), plus a '(total)' grand-total row — the
    * reference's running totals, computed distributed instead of in a row
    * loop. */
  def pivotRegister(facts: DataFrame, groupCol: Column, pivotCol: Column,
                    pivotValues: Seq[String], amount: Column): DataFrame = {
    def pivoted(df: DataFrame, g: Column): DataFrame =
      df.groupBy(g.as("group_key"))
        .pivot(pivotCol, pivotValues)
        .agg(round(sum(amount), 2))
    val detail = pivoted(facts, groupCol)
    val total = pivoted(facts, lit("(total)"))
    detail.unionByName(total)
      .na.fill(0.0, pivotValues)
      .orderBy(col("group_key"))
  }

  /** [[pivotRegister]] with the grand-total row derived FROM the pivoted
    * detail instead of a second pass over `facts`. This is the closer
    * twin of the reference's row loop — its running totals accumulate
    * the per-row DISPLAYED (rounded) cell values
    * (etl_account/wizard/sales_report.py:174-190 `total_* += ...` after
    * each written cell), so the total of a column is the sum of its
    * rounded cells — and the fact side feeds ONE aggregation chain: the
    * total branch re-aggregates the detail's exchange (reused, not
    * rescanned), which matters when `facts` is itself an expensive
    * subplan (q180 feeds the tax-totals explode through it). */
  def pivotRegisterRollup(facts: DataFrame, groupCol: Column,
                          pivotCol: Column, pivotValues: Seq[String],
                          amount: Column): DataFrame = {
    require(pivotValues.nonEmpty, "pivotValues must be non-empty")
    val detail = facts.groupBy(groupCol.as("group_key"))
      .pivot(pivotCol, pivotValues)
      .agg(round(sum(amount), 2))
      .na.fill(0.0, pivotValues)
    val total = detail.groupBy(lit("(total)").as("group_key"))
      .agg(round(sum(col(pivotValues.head)), 2).as(pivotValues.head),
        pivotValues.tail.map(v => round(sum(col(v)), 2).as(v)): _*)
    detail.unionByName(total).orderBy(col("group_key"))
  }
}
