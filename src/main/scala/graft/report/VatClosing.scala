package graft.report

import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generic tax report's VAT closing entry
  * (reference account_generic_tax_report.py:586-865): one closing move
  * per fiscal position (domestic = none), each balancing the period's
  * tax accounts and booking the net against the tax group's
  * receivable/payable property account.
  *
  *  1. per fpos, sum the period's POSTED tax lines whose repartition
  *     line has `use_in_tax_closing` — grouped by (tax group, tax,
  *     account) (:704-720); the period snaps to the company periodicity
  *     boundaries containing `date_to` (:729-731), which the caller
  *     passes resolved as [periodStart, periodEnd];
  *  2. each (tax, account) total becomes a move line REVERSING the
  *     balance — debit |amt| if amt < 0 else credit amt (:763-766) —
  *     and accumulates into the group total, skipped entirely when the
  *     group lacks receivable/payable properties (:757-758);
  *  3. group totals consolidate per (advance, receivable, payable)
  *     account triplet — two groups sharing the same three accounts
  *     merge (:768-776);
  *  4. per triplet (:843-865): any advance/receivable/payable account
  *     with a posted balance through `endDate` is itself balanced into
  *     the move (each account at most once across triplets), the
  *     balances folding into the total; the net books 'Payable tax
  *     amount' (credit on the payable account) when total < 0, else
  *     'Receivable tax amount' (debit on the receivable) (:857-864).
  *
  * Scale: the only fact-sized work is the two filtered aggregations —
  * the period tax-line groupBy (bounded by #fpos × #tax × #account
  * groups) and the property-account history sum (semi-filtered by the
  * bounded configured-account list before it shuffles). Assembly runs
  * driver-side over dimension-sized rows.
  */
object VatClosing {

  /** A tax group's closing configuration (the property accounts).
    * Groups appear in the output in the order given here (the
    * reference's result-dict insertion order). */
  final case class GroupAccounts(group: String, advance: Option[String],
                                 receivable: String, payable: String)

  /** One line of a closing move. */
  final case class Line(name: String, debit: Double, credit: Double,
                        account: String)

  private def isZero(v: Double): Boolean = math.abs(v) < 0.005

  /** `taxLines`: (fpos nullable, tax_group, tax_id, tax_name, account,
    * balance, d date/timestamp, closing boolean, posted boolean) — the
    * journal's tax repartition lines, `closing` = use_in_tax_closing.
    * `history`: (account, balance, d, posted) — the full ledger, used
    * only for the property accounts' prior balances.
    * Returns the closing move lines per fiscal position, for every fpos
    * in `fposScope` (None = domestic). */
  /** `emptyAdjustment`: the (sale tax account, purchase tax account)
    * pair used for the two 0-valued placeholder lines when a closing
    * has no content at all (:785-812 — the reference searches the first
    * sale/purchase repartition accounts; here the caller resolves them). */
  def compute(taxLines: DataFrame, history: DataFrame,
              groups: Seq[GroupAccounts],
              periodStart: LocalDate, periodEnd: LocalDate,
              endDate: LocalDate,
              fposScope: Seq[Option[String]],
              emptyAdjustment: Option[(String, String)] = None): Map[Option[String], Seq[Line]] = {
    def ts(d: LocalDate) = lit(d.toString).cast("timestamp")

    // 1. period tax sums per (fpos, group, tax, account) — ONE bounded
    //    groupBy over the filtered slice (:704-720)
    val fposKeys = fposScope.flatten
    val fposPred =
      if (fposScope.contains(None) && fposKeys.nonEmpty)
        col("fpos").isNull || col("fpos").isin(fposKeys: _*)
      else if (fposScope.contains(None)) col("fpos").isNull
      else col("fpos").isin(fposKeys: _*)
    val sums = taxLines
      .filter(col("posted") && col("closing") && fposPred &&
        col("d") >= ts(periodStart) && col("d") <= ts(periodEnd))
      .groupBy(col("fpos"), col("tax_group"), col("tax_id"),
        col("tax_name"), col("account"))
      .agg(sum(col("balance")).as("amt"))
      .collect().toSeq
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getDouble(5)))

    // 4-prep. property-account balances through endDate — the account
    //    list is bounded config, so the filter prunes BEFORE the shuffle
    val propertyAccounts =
      groups.flatMap(g => g.advance.toSeq ++ Seq(g.receivable, g.payable)).distinct
    val histBal: Map[String, Double] =
      if (propertyAccounts.isEmpty) Map.empty
      else history
        .filter(col("posted") && col("account").isin(propertyAccounts: _*) &&
          col("d") <= ts(endDate))
        .groupBy(col("account")).agg(sum(col("balance")).as("bal"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // driver-side assembly per fpos (dimension-sized)
    fposScope.map { fpos =>
      val rows = sums.filter(_._1 == fpos)
      val lines = scala.collection.mutable.ArrayBuffer[Line]()
      // 2. reverse each (tax, account) balance; total per group
      //    (:757-766), consolidated per account triplet (:768-776)
      val subtotal = scala.collection.mutable.LinkedHashMap[
        (Option[String], String, String), Double]()
      for (g <- groups) {
        var total = 0.0
        for ((_, _, _, taxName, account, amt) <-
               rows.filter(_._2 == g.group).sortBy(r => (r._3, r._5))) {
          lines += Line(taxName,
            debit = if (amt < 0) math.abs(amt) else 0.0,
            credit = if (amt > 0) amt else 0.0,
            account = account)
          total += amt
        }
        if (!isZero(total)) {
          val key = (g.advance, g.receivable, g.payable)
          subtotal(key) = subtotal.getOrElse(key, 0.0) + total
        }
      }
      // 4. balance the property accounts (each at most once), then the
      //    receivable/payable net (:843-865)
      val balanced = scala.collection.mutable.Set[String]()
      for (((advance, receivable, payable), sub) <- subtotal) {
        var total = sub
        for (acct <- advance.toSeq ++ Seq(receivable, payable)
             if !balanced.contains(acct)) {
          balanced += acct
          val bal = histBal.getOrElse(acct, 0.0)
          if (!isZero(bal)) {
            val name = acct match {
              case a if advance.contains(a) => "Balance tax advance payment account"
              case `receivable` => "Balance tax current account (receivable)"
              case _ => "Balance tax current account (payable)"
            }
            lines += Line(name,
              debit = if (bal < 0) math.abs(bal) else 0.0,
              credit = if (bal > 0) math.abs(bal) else 0.0,
              account = acct)
            total += bal
          }
        }
        if (!isZero(total))
          lines += Line(
            if (total < 0) "Payable tax amount" else "Receivable tax amount",
            debit = if (total > 0) total else 0.0,
            credit = if (total < 0) math.abs(total) else 0.0,
            account = if (total < 0) payable else receivable)
      }
      // empty closing → the two 0-valued adjustment placeholders
      // (:785-812), sale account first
      val out =
        if (lines.isEmpty) emptyAdjustment.toSeq.flatMap { case (sale, purchase) =>
          Seq(Line("Tax Received Adjustment", 0.0, 0.0, sale),
            Line("Tax Paid Adjustment", 0.0, 0.0, purchase))
        }
        else lines.toSeq
      fpos -> out
    }.toMap
  }
}
