package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's `tax_tags` formula engine
  * (account_reports/models/account_report.py:2535-2602): a report cell sums
  * fact amounts carrying a named tax tag, where the tag itself has a ±
  * polarity (its name is stored signed, '+TAG' / '-TAG') and rows can flag
  * `tax_tag_invert` — two stacked ±1 sign flips on the measure (SURVEY
  * §2.4 A8 + §2.3 J3).
  *
  * Shape: fact ⟕ bridge ⟕ tag-dim (both joins through the m2m bridge,
  * account_report.py:2572-2576), then one signed aggregation. Scale: the
  * tag dim and bridge are broadcastable; the fact never re-shuffles except
  * for the final small groupBy. */
object TaxTags {

  /** The `tax_tag_invert` flag a journal line carries into [[evaluate]]
    * (reference semantics pinned by
    * account_reports/tests/test_tax_report.py:1972-2047 — an entry plus
    * its cancel-reversal must DOUBLE the report lines, not zero them):
    * for `entry` moves the flag follows the tax direction and refund
    * side ((sale ∧ ¬refund) ∨ (purchase ∧ refund)); for documents it is
    * the inbound set (out_invoice / out_receipt / in_refund). */
  def tagInvert(moveType: String, taxUse: String, isRefund: Boolean): Boolean =
    if (moveType == "entry")
      (taxUse == "sale" && !isRefund) || (taxUse == "purchase" && isRefund)
    else Set("out_invoice", "out_receipt", "in_refund").contains(moveType)

  /** Evaluate tag totals.
    * `facts`: (fact_id, amount, tax_tag_invert: boolean).
    * `bridge`: (fact_id, tag_id).
    * `tags`: (tag_id, tag_name) with signed names ('+BASE', '-BASE', ...).
    * Output: one row per unsigned tag name with the signed total. */
  def evaluate(facts: DataFrame, bridge: DataFrame, tags: DataFrame): DataFrame =
    evaluateBy(facts, bridge, tags, Nil)

  /** Same engine with extra grouping keys (columns of `facts`) — the EC
    * sales shape: tag totals per partner country
    * (account_sales_report in the reference family). */
  def evaluateBy(facts: DataFrame, bridge: DataFrame, tags: DataFrame,
                 extraKeys: Seq[Column]): DataFrame = {
    val tagSign = when(substring(col("tag_name"), 1, 1) === "-", lit(-1.0))
      .otherwise(lit(1.0))
    val invSign = when(col("tax_tag_invert"), lit(-1.0)).otherwise(lit(1.0))
    facts
      .join(broadcast(bridge), "fact_id")
      .join(broadcast(tags), "tag_id")
      .groupBy(extraKeys :+ substring(col("tag_name"), 2, 1000).as("tag"): _*)
      .agg(sum(col("amount") * tagSign * invSign).as("total"))
  }
}
