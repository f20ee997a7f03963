package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.TaxCompute
import graft.engine.TaxCompute.{Params, TaxDef}

/** The invoice tax-totals summary — the reference's `_aggregate_taxes` +
  * `_prepare_tax_totals` (etl_account/models/account_tax.py:354-530), the
  * per-tax-group aggregation over `compute_all` outputs that feeds every
  * invoice footer (account_move.py:606-674 `_compute_tax_totals`) and the
  * sales/purchase wizards' amount-by-group lists (wizard/sales_report.py,
  * wizard/purchase_report.py):
  *
  *  1. per line, `_compute_taxes_for_single_line` (:263-351): price after
  *     the line discount (:273) and optionally after an early-pay
  *     discount (:279-281), then the [[TaxCompute]]-compiled chain;
  *     `price_subtotal` = the dp-rounded total_excluded (:303); a line
  *     WITHOUT taxes contributes its currency-rounded subtotal and no
  *     tax lines (:342-349);
  *  2. `_aggregate_taxes` (:354-439) groups the tax lines by tax GROUP
  *     with the no-double-count rule (:393-404): within one (group,
  *     line-record) the base counts ONCE — the FIRST tax line's base in
  *     tax order — while tax amounts all add;
  *  3. `_prepare_tax_totals` (:441-530): per-group dp rounding (:466-467),
  *     manual tax-line overrides replacing a group's tax amount
  *     (:469-475), group order by (sequence, id) (:479), and the subtotal
  *     partition by preceding_subtotal — each subtotal line shows
  *     untaxed + the tax of the EARLIER subtotals (:503-513).
  *
  * Scale: the per-line computation is the same codegen'd projection as
  * q173 — no UDF, no driver loop over lines; the untaxed subtotal rides
  * the SAME exploded aggregation as the tax lines under a sentinel group,
  * so the whole summary is ONE scan into a two-level groupBy — (record,
  * group) then (group) — whose second level is bounded by the tax-group
  * dimension. Only per-group rows reach the driver; the subtotal layout
  * is dimension-sized.
  *
  * The reference's `early_pay_discount_computation='excluded'` delta
  * branch (:307-324) is NOT implemented: the reference code in that
  * branch is unreachable-as-written (its `delta_tax = round(...),`
  * trailing commas build tuples, so `tax_res['amount'] += delta_tax`
  * raises TypeError on first use, and no reference test exercises it);
  * [[prepareTaxTotals]] rejects it loudly. 'included' — a pure price
  * scaling (:279-281) — is supported.
  */
object TaxTotals {

  /** A tax group (the reference's account.tax.group dim): `sequence`
    * orders groups and drives the subtotal partition; `precedingSubtotal`
    * names the subtotal line the group appears under (None = the default
    * "Untaxed Amount" bucket, :490). */
  final case class GroupDef(id: Long, name: String, sequence: Int = 0,
                            precedingSubtotal: Option[String] = None)

  final case class GroupTotal(group: GroupDef, baseAmount: Double,
                              taxAmount: Double)
  final case class Subtotal(name: String, amount: Double)

  /** `_prepare_tax_totals`' result (:522-530), minus the locale
    * formatting strings (rendering, out of scope per SURVEY §2.1). */
  final case class Totals(amountUntaxed: Double, amountTax: Double,
                          amountTotal: Double, groups: Seq[GroupTotal],
                          subtotals: Seq[Subtotal],
                          subtotalsOrder: Seq[String],
                          displayTaxBase: Boolean)

  private def rndAt(v: Double, dec: Int): Double =
    BigDecimal(v).setScale(dec, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Distributed `_aggregate_taxes` core over a per-tax-line frame
    * (record, gid, ord, base, amount): the once-per-record base rule is
    * `min_by(base, ord)` under (record, gid), then the group rollup.
    * Exposed for plan audits; [[prepareTaxTotals]] builds its input. */
  private[graft] def aggregateByGroup(taxLines: DataFrame): DataFrame =
    taxLines
      .groupBy(col("rec"), col("gid"))
      .agg(min_by(col("base"), col("ord")).as("base_once"),
        sum(col("amount")).as("tax_amt"))
      .groupBy(col("gid"))
      .agg(sum(col("base_once")).as("base_amount"),
        sum(col("tax_amt")).as("tax_amount"))

  /** The distributed footer plan: per-group (base_amount, tax_amount)
    * rows PLUS the sentinel group −1 carrying Σ price_subtotal (amount
    * untaxed). Lazy — [[prepareTaxTotals]] collects it; exposed so plan
    * audits can pin the one-scan shape. */
  private[graft] def footerAggregate(lines: DataFrame, record: Column,
                                     priceUnit: Column, quantity: Column,
                                     discount: Column, hasTaxes: Column,
                                     chain: Seq[TaxDef],
                                     taxToGroup: Map[Long, GroupDef],
                                     dp: Int, params: Params,
                                     earlyPayDiscount: Option[(String, Double)])
      : DataFrame = {
    require(!earlyPayDiscount.exists(_._1 == "excluded"),
      "early_pay_discount_computation='excluded' is unsupported: the " +
        "reference branch (account_tax.py:307-324) is broken as written " +
        "(tuple-building trailing commas) and untested — see scaladoc")
    chain.foreach(t => require(taxToGroup.contains(t.id),
      s"tax ${t.id} has no tax group mapping"))

    // :273 line discount, then :279-281 the early-pay 'included' scaling
    val afterDiscount = priceUnit * (lit(1.0) - coalesce(discount, lit(0.0)) / 100.0)
    val price = earlyPayDiscount match {
      case Some(("included", pct)) => afterDiscount * ((100.0 - pct) / 100.0)
      case _ => afterDiscount
    }
    val c = TaxCompute.compile(chain, price, quantity, params)

    // price_subtotal: dp-rounded total_excluded for taxed lines (:303),
    // currency-rounded price·qty for untaxed ones (:343)
    val subtotal = when(hasTaxes, round(c.totalExcluded, dp))
      .otherwise(round(price * quantity, params.precision))

    // ONE scan: the untaxed subtotal rides the same explode under the
    // sentinel group −1 (ord −1, amount 0), so both aggregation levels
    // and the global untaxed sum come out of a single shuffle chain
    val sentinel = struct(lit(-1L).as("gid"), lit(-1).as("ord"),
      subtotal.as("base"), lit(0.0).as("amount"))
    val entries = c.lines.zipWithIndex.map { case (l, i) =>
      struct(lit(taxToGroup(l.tax.id).id).as("gid"), lit(i).as("ord"),
        l.base.as("base"), l.amount.as("amount"))
    }
    val exploded = lines.select(record.as("rec"),
        explode(when(hasTaxes, array(sentinel +: entries: _*))
          .otherwise(array(sentinel))).as("e"))
      .select(col("rec"), col("e.gid").as("gid"), col("e.ord").as("ord"),
        col("e.base").as("base"), col("e.amount").as("amount"))
    aggregateByGroup(exploded)
  }

  /** Compute the tax totals of a document-line corpus.
    *
    * `record` identifies the line (the reference's base_line['record']);
    * `hasTaxes` marks lines carrying the chain (others contribute only
    * their untaxed subtotal, :342-349); `discount` is the line discount
    * percent (:273). `taxToGroup` maps every chain tax id to its group;
    * `dp` is the partner's invoice_decimal (:265-272, default 2);
    * `params` forwards to [[TaxCompute.compile]]. `manualTaxLines` are
    * (group id, company tax amount) pairs from manually edited tax lines
    * (:469-475). `earlyPayDiscount` = Some(("included"|"excluded"), pct). */
  def prepareTaxTotals(lines: DataFrame, record: Column, priceUnit: Column,
                       quantity: Column, discount: Column, hasTaxes: Column,
                       chain: Seq[TaxDef], taxToGroup: Map[Long, GroupDef],
                       dp: Int = 2, params: Params = Params(),
                       earlyPayDiscount: Option[(String, Double)] = None,
                       manualTaxLines: Seq[(Long, Double)] = Nil): Totals = {
    val perGroup = footerAggregate(lines, record, priceUnit, quantity,
        discount, hasTaxes, chain, taxToGroup, dp, params, earlyPayDiscount)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    // ---- _prepare_tax_totals' driver-side layout (dimension-sized) ----
    val amountUntaxedRaw = perGroup.get(-1L).map(_._1).getOrElse(0.0)
    val groupTotals = perGroup.keys.filter(_ >= 0).toSeq
      .map { gid =>
        val g = taxToGroup.values.find(_.id == gid).getOrElse(
          throw new IllegalStateException(s"group $gid missing from dim"))
        val (b, t) = perGroup(gid)
        // manual tax-line edits replace the group's tax amount (:469-475)
        val manual = manualTaxLines.filter(_._1 == gid)
        val tax = if (manual.nonEmpty) manual.map(_._2).sum else t
        GroupTotal(g, rndAt(b, dp), rndAt(tax, dp))
      }
      .sortBy(gt => (gt.group.sequence, gt.group.id))

    // subtotal partition (:481-513): title order = min group sequence;
    // each subtotal shows untaxed + the tax accumulated BEFORE it
    val subtotalOrder = scala.collection.mutable.LinkedHashMap[String, Int]()
    val groupsBySubtotal =
      scala.collection.mutable.LinkedHashMap[String, Vector[GroupTotal]]()
    for (gt <- groupTotals) {
      val title = gt.group.precedingSubtotal.getOrElse("Untaxed Amount")
      subtotalOrder(title) =
        math.min(subtotalOrder.getOrElse(title, Int.MaxValue), gt.group.sequence)
      groupsBySubtotal(title) = groupsBySubtotal.getOrElse(title, Vector()) :+ gt
    }
    val order = subtotalOrder.keys.toSeq.sortBy(subtotalOrder)
    var amountTax = 0.0
    val subtotals = order.map { title =>
      val st = Subtotal(title, rndAt(amountUntaxedRaw + amountTax, dp))
      amountTax += groupsBySubtotal(title).map(_.taxAmount).sum
      st
    }
    val amountUntaxed = rndAt(amountUntaxedRaw, dp)
    val amountTaxR = rndAt(amountTax, dp)
    // :519-520 — one group whose base differs from untaxed, or >1 group.
    // The reference compares via currency.compare_amounts (:524) — the
    // CURRENCY's rounding grid (params.precision), not the partner dp —
    // so a sub-grid difference between the dp-rounded values must NOT
    // flip the flag, and a 3-decimal currency compares at mills.
    val gridUnit = math.pow(10.0, params.precision)
    def grid(v: Double): Long = math.round(v * gridUnit)
    val displayTaxBase = (groupTotals.size == 1 &&
      grid(groupTotals.head.baseAmount) != grid(amountUntaxed)) ||
      groupTotals.size > 1
    Totals(amountUntaxed, amountTaxR,
      rndAt(amountUntaxed + amountTaxR, dp), groupTotals, subtotals, order,
      displayTaxBase)
  }
}
