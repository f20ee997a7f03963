package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cash-basis tax exigibility (reference: the CABA predicate every
  * generic-tax-report query carries, account_generic_tax_report.py:
  * 170-176 / 242-248 — `always_tax_exigible OR tax_cash_basis_rec_id
  * IS NOT NULL OR tax_exigibility != 'on_payment'` — together with the
  * caba entries the reconciliation machinery books at payment time,
  * pinned by account_reports/tests/test_tax_report.py:926-1169):
  *
  *  - a line whose tax is NOT on-payment is exigible as booked;
  *  - a move with no payable/receivable line is ALWAYS exigible,
  *    whatever its taxes (:1479-1561);
  *  - an on-payment line becomes exigible pro-rata to EACH
  *    reconciliation partial of its document — full payment surfaces
  *    the full amounts, half payment half of them, no payment nothing,
  *    and a refund reconciled against the invoice counts like a payment
  *    (:1031-1147).
  *
  * Scale: one filter splits the journal; the caba slice equi-joins the
  * partials on the document key (both shuffle-partitioned on doc_id,
  * never a cartesian) and scales amounts in the projection.
  */
object CashBasis {

  /** `lines`: tagged journal lines with `doc_id`, `amount`,
    * `on_payment` (the tax's exigibility), `always_exigible` (the
    * move-level override) plus any passthrough columns.
    * `partials`: (doc_id, fraction, pd) — one row per reconciliation
    * partial, `fraction` the share of the document it pays, `pd` its
    * date. Returns the exigible lines: immediate ones as booked, caba
    * ones scaled per partial and re-dated to the payment. */
  def exigible(lines: DataFrame, partials: DataFrame): DataFrame = {
    val immediate = lines.filter(!col("on_payment") || col("always_exigible"))
    val scaled = lines.filter(col("on_payment") && !col("always_exigible"))
      .join(partials, Seq("doc_id"))
      .withColumn("amount", col("amount") * col("fraction"))
    val caba = (if (lines.columns.contains("d")) scaled.withColumn("d", col("pd"))
      else scaled).drop("fraction", "pd")
    immediate.unionByName(caba)
  }
}
