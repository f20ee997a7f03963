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
  *     tax lines (:342-349); each tax line also carries the COMPANY-
  *     currency leg (:330-340): `base_amount = currency.round(base /
  *     rate)`, `tax_amount = round(maybe_currency_round(amount / rate),
  *     dp)` where the currency round applies under round_per_line;
  *  2. `_aggregate_taxes` (:354-439) groups the tax lines by tax GROUP
  *     with the no-double-count rule (:393-404): within one (group,
  *     line-record) the base counts ONCE — the FIRST tax line's base in
  *     tax order — while tax amounts all add; the same accumulation also
  *     runs per RECORD (`tax_details_per_record`, :372-384), and the
  *     record-level company base is `currency.round(price_subtotal /
  *     rate)` (:415-417);
  *  3. `_prepare_tax_totals` (:441-530): per-group dp rounding (:466-467),
  *     manual tax-line overrides replacing a group's tax amount
  *     (:469-475), group order by (sequence, id) (:479), and the subtotal
  *     partition by preceding_subtotal — each subtotal line shows
  *     untaxed + the tax of the EARLIER subtotals (:503-513). The footer
  *     itself uses only the document-currency leg (:463-467); the company
  *     leg is exposed through [[aggregateTaxes]] / [[taxDetailsPerRecord]]
  *     for `_aggregate_taxes` consumers.
  *
  * Scale: the per-line computation is the same codegen'd projection as
  * q173 — no UDF, no driver loop over lines; the untaxed subtotal rides
  * the SAME exploded aggregation as the tax lines under a sentinel group,
  * so the whole summary is ONE scan into a two-level groupBy — (record,
  * group) then (group) — whose second level is bounded by the tax-group
  * dimension. Only per-group rows reach the driver; the subtotal layout
  * is dimension-sized. A corpus mixing SEVERAL tax chains stays one scan
  * too: each distinct chain compiles once and a per-row key selects its
  * exploded entry array (the compile-per-variant/select-per-row mechanism
  * of [[LineTotals.computePerPartner]]).
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

  /** The footer's `round(tools.float_round(x, dp_dic[dp]), dp)` two-step
    * (:443 `dp_dic = {2: 0.01, 3: 0.001, 0: 0.01}`, used :466-467,
    * :508-513, :515-517). For dp ∈ {2,3} both steps round on the SAME
    * grid, so they collapse to one HALF_UP round. For dp = 0 the grids
    * DIFFER: float_round half-ups at CENTS first, then Python's `round`
    * — HALF-EVEN — takes the cent value to the integer grid, so
    * 2.50 → 2 (not 3) and 1.496 → 1.50 → 2 (a direct half-up round at
    * 0 decimals would give 1). Any other dp raises, like the
    * reference's dp_dic KeyError — silent one-round behavior at dp = 0
    * is the one unacceptable outcome. */
  private[graft] def footerRound(v: Double, dp: Int): Double = dp match {
    case 2 | 3 => rndAt(v, dp)
    case 0 => BigDecimal(rndAt(v, 2))
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    case d => throw new IllegalArgumentException(
      s"footer decimal count $d is outside the reference's dp_dic " +
        "domain {0, 2, 3} (account_tax.py:443)")
  }

  /** `_aggregate_taxes`' per-record level (:372-384): one row per
    * (record, grouping key) with the once-per-record base rule —
    * `min_by(base, ord)` under (record, gid) — on each present
    * currency leg, while tax amounts all add (:393-404). The sentinel
    * group −1 row carries the record's untaxed subtotal: its
    * `base_amount` is the record's `price_subtotal` (the reference's
    * record-level base_amount_currency, :412-417) and its
    * `base_amount_company` the `currency.round(price_subtotal / rate)`
    * company leg. `hasCompanyLeg` states whether [[explodedTaxLines]]
    * built the company columns (footer callers don't, so they are
    * never computed there) — threaded explicitly so a caller frame
    * that happens to carry a `base_co` column can't flip the
    * aggregation shape silently. */
  private[graft] def perRecordDetails(taxLines: DataFrame,
                                      hasCompanyLeg: Boolean): DataFrame = {
    val company =
      if (!hasCompanyLeg) Nil
      else Seq(min_by(col("base_co"), col("ord")).as("base_amount_company"),
        sum(col("amount_co")).as("tax_amount_company"))
    taxLines
      .groupBy(col("rec"), col("gid"))
      .agg(min_by(col("base"), col("ord")).as("base_amount"),
        (sum(col("amount")).as("tax_amount") +: company): _*)
  }

  /** Distributed `_aggregate_taxes` group rollup over a per-tax-line
    * frame (rec, gid, ord, base, amount [, base_co, amount_co]): the
    * [[perRecordDetails]] level summed per group. Exposed for plan
    * audits; [[footerAggregate]] builds its input. */
  private[graft] def aggregateByGroup(taxLines: DataFrame,
                                      hasCompanyLeg: Boolean): DataFrame = {
    val details = perRecordDetails(taxLines, hasCompanyLeg)
    val company =
      if (!hasCompanyLeg) Nil
      else Seq(sum(col("base_amount_company")).as("base_amount_company"),
        sum(col("tax_amount_company")).as("tax_amount_company"))
    details
      .groupBy(col("gid"))
      .agg(sum(col("base_amount")).as("base_amount"),
        (sum(col("tax_amount")).as("tax_amount") +: company): _*)
  }

  /** The per-tax-line explode feeding both aggregation levels: ONE scan
    * whose every row becomes (sentinel −1 row + one row per compiled tax
    * line of ITS chain). `chainKey` selects the row's chain among the
    * compiled `chains`; a key matching no chain (or a chain that is
    * empty) contributes like the reference's taxes-empty branch
    * (:342-349) — the currency-rounded subtotal under the sentinel, no
    * tax rows. `companyLeg` = Some(rate) additionally builds the
    * company-currency fields (amounts DIVIDE by the document→company
    * rate, :330, :415-417; pass lit(1.0) for company-currency
    * documents); None skips them entirely — the footer only reads the
    * document leg (:463-467), so it never pays for the conversion
    * arithmetic or the extra aggregate buffers.
    *
    * `groupingKey` mirrors `_aggregate_taxes`' `grouping_key_generator`
    * (:356-358, :425-426): None = the footer's by-tax-GROUP generator
    * (`_prepare_tax_totals` passes `{'tax_group': tax.tax_group_id}`,
    * :456-460), so gid = `taxToGroup(tax.id).id`; Some(f) = a custom
    * generator over the tax — [[byTax]] is the reference's DEFAULT
    * (`tax_repartition_line.tax_id`, :357). Custom keys must avoid the
    * sentinel −1 (checked against every chain tax up front, since the
    * chains are static). `taxToGroup` must cover every chain tax only
    * under the default generator.
    *
    * `filterTaxValues` mirrors `filter_tax_values_to_apply` (:422):
    * a POST-compute filter — the chain computes in full (affect-base /
    * price-included interactions intact, and the sentinel keeps the
    * full-chain `price_subtotal`) and only the AGGREGATION drops the
    * failing tax lines, exactly like the reference skips them inside
    * the accumulation loop. This is NOT pre-filtering the chain, which
    * would recompute the surviving taxes on different bases. The
    * predicate sees (chainKey, tax) — per-chain variation stands in for
    * the reference's base_line argument, whose consumers key off tax
    * attributes (e.g. cash-basis exigibility). */
  private[graft] def explodedTaxLines(lines: DataFrame, record: Column,
                                      priceUnit: Column, quantity: Column,
                                      discount: Column, chainKey: Column,
                                      chains: Seq[(Int, Seq[TaxDef])],
                                      taxToGroup: Map[Long, GroupDef],
                                      dp: Int, params: Params,
                                      earlyPayDiscount: Option[(String, Double)],
                                      companyLeg: Option[Column],
                                      groupingKey: Option[TaxDef => Long] = None,
                                      filterTaxValues: Option[(Int, TaxDef) => Boolean] = None): DataFrame = {
    require(!earlyPayDiscount.exists(_._1 == "excluded"),
      "early_pay_discount_computation='excluded' is unsupported: the " +
        "reference branch (account_tax.py:307-324) is broken as written " +
        "(tuple-building trailing commas) and untested — see scaladoc")
    require(dp == 2 || dp == 3,
      s"line decimal count $dp is outside _compute_taxes_for_single_line's " +
        "dp_dic domain {2, 3} (account_tax.py:265) — the reference raises " +
        "KeyError; a dp=0 CURRENCY rounds the footer only (pass footerDp)")
    chains.foreach { case (_, chain) =>
      chain.foreach { t =>
        groupingKey match {
          case None => require(taxToGroup.contains(t.id),
            s"tax ${t.id} has no tax group mapping")
          case Some(f) => require(f(t) != -1L,
            s"grouping key of tax ${t.id} collides with the sentinel -1")
        }
      }
    }
    require(chains.map(_._1).distinct.size == chains.size,
      "duplicate chain keys")
    val gidOf: TaxDef => Long =
      groupingKey.getOrElse(t => taxToGroup(t.id).id)

    // r18 optimization: every sequential accumulation point of the chain
    // compilation (and the shared discounted price) is MATERIALIZED as a
    // named projection column instead of re-inlined into each consumer
    // expression — [[TaxCompute.compile]]'s mat hook documents why (the
    // fully inlined generator tree exceeded the JVM's JIT method limit
    // and ran interpreted). Values are bit-identical; only sharing
    // changes. The columns are computed UNCONDITIONALLY per row (the old
    // when-chain evaluated only the row's own chain lazily) — pure
    // JIT-compiled double arithmetic, orders of magnitude cheaper than
    // the interpreted evaluation it replaces, and safe: no branch can
    // throw (double division yields ±Inf/NaN, consumed only by the row's
    // own chain entries via the chainKey selection).
    val matBuf = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    def register(name: String, c: Column): Column = {
      matBuf += name -> c
      col(name)
    }

    // :273 line discount, then :279-281 the early-pay 'included' scaling
    val afterDiscount = priceUnit * (lit(1.0) - coalesce(discount, lit(0.0)) / 100.0)
    val price = register("__tc_price", earlyPayDiscount match {
      case Some(("included", pct)) => afterDiscount * ((100.0 - pct) / 100.0)
      case _ => afterDiscount
    })
    // company-currency conversions (:330-334, :415-417): bases currency-
    // round after /rate; per-line tax amounts currency-round only under
    // round_per_line, then dp-round either way
    def companyFields(base: Column, amount: Column): Seq[Column] =
      companyLeg.toSeq.flatMap { rt =>
        val conv = amount / rt
        Seq(round(base / rt, params.precision).as("base_co"),
          round(if (params.roundGlobally) conv
            else round(conv, params.precision), dp).as("amount_co"))
      }
    def entry(gid: Column, ord: Column, base: Column, amount: Column) =
      struct((Seq(gid.as("gid"), ord.as("ord"), base.as("base"),
        amount.as("amount")) ++ companyFields(base, amount)): _*)

    // the taxes-empty contribution (:342-349): currency-rounded subtotal
    val untaxedArr = array(entry(lit(-1L), lit(-1),
      round(price * quantity, params.precision), lit(0.0)))
    // one compiled entry array per distinct chain; the row's key selects
    val arr = chains.foldRight(untaxedArr) { case ((key, chain), other) =>
      if (chain.isEmpty) when(chainKey === key, untaxedArr).otherwise(other)
      else {
        val c = TaxCompute.compile(chain, price, quantity, params,
          (n, e) => register(s"__tc_${key}_$n", e))
        // price_subtotal: dp-rounded total_excluded for taxed lines (:303)
        val sentinel = entry(lit(-1L), lit(-1), round(c.totalExcluded, dp),
          lit(0.0))
        // ord = the tax-order index BEFORE filtering, so the first-base
        // rule still picks the first SURVIVING line in tax order (the
        // reference initializes the base from the first non-skipped
        // tax_values, :394-399)
        val entries = c.lines.zipWithIndex
          .filter { case (l, _) => filterTaxValues.forall(p => p(key, l.tax)) }
          .map { case (l, i) => entry(lit(gidOf(l.tax)), lit(i), l.base, l.amount) }
        when(chainKey === key, array(sentinel +: entries: _*)).otherwise(other)
      }
    }
    val companyCols =
      if (companyLeg.isEmpty) Nil
      else Seq(col("e.base_co").as("base_co"),
        col("e.amount_co").as("amount_co"))
    // one chained select per materialized column: each may reference the
    // previous ones, so they cannot share a single projection; Catalyst
    // keeps the multiply-referenced ones as real columns (CollapseProject
    // refuses to duplicate non-cheap expressions) and inlines the rest
    val withMats = matBuf.foldLeft(lines) { case (df, (n, c)) =>
      df.select(col("*"), c.as(n))
    }
    // `record` gets a GENERATOR-FREE projection of its own before the
    // explode: putting an aliased struct() in the same projection as a
    // generator lets the analyzer's generator extraction strip the
    // struct's field aliases (observed on the sliced footer's (s, r)
    // record struct, which then fails rec.s resolution). The entry ARRAY
    // stays an expression in the generator projection deliberately —
    // aliasing it as a single-use column would let CollapseProject
    // re-inline every materialized column into one giant expression
    // (measured: 1.5 MB of codegen, compile failure, interpreted
    // fallback), undoing the mat cut.
    withMats.select(col("*"), record.as("__tc_rec"))
      .select(col("__tc_rec").as("rec"), explode(arr).as("e"))
      .select((Seq(col("rec"), col("e.gid").as("gid"),
        col("e.ord").as("ord"), col("e.base").as("base"),
        col("e.amount").as("amount")) ++ companyCols): _*)
  }

  /** The distributed footer plan: per-group (base, tax) rows on the
    * DOCUMENT leg (`_prepare_tax_totals` reads only that one, :463-467)
    * PLUS the sentinel group −1 carrying Σ price_subtotal (amount
    * untaxed). Lazy — [[prepareTaxTotalsMulti]] collects it; exposed so
    * plan audits can pin the one-scan shape. */
  private[graft] def footerAggregate(lines: DataFrame, record: Column,
                                     priceUnit: Column, quantity: Column,
                                     discount: Column, chainKey: Column,
                                     chains: Seq[(Int, Seq[TaxDef])],
                                     taxToGroup: Map[Long, GroupDef],
                                     dp: Int, params: Params,
                                     earlyPayDiscount: Option[(String, Double)])
      : DataFrame =
    aggregateByGroup(explodedTaxLines(lines, record, priceUnit, quantity,
      discount, chainKey, chains, taxToGroup, dp, params, earlyPayDiscount,
      companyLeg = None), hasCompanyLeg = false)

  /** The reference's DEFAULT `grouping_key_generator` (:356-358): group
    * by the TAX itself (`tax_values['tax_repartition_line'].tax_id`) —
    * what `_aggregate_taxes` does when the caller passes no generator;
    * the footer overrides it with the by-tax-GROUP generator
    * (:456-460), which is this module's None default. */
  val byTax: TaxDef => Long = _.id

  /** The `_aggregate_taxes` group frame (:354-439) as a distributed
    * result: one row per grouping key — (gid, base_amount, tax_amount
    * [, base_amount_company, tax_amount_company]) — plus the sentinel
    * row gid −1 whose base columns are the corpus' untaxed subtotal on
    * each leg. Everything [[prepareTaxTotalsMulti]] computes, kept as a
    * DataFrame for consumers aggregating further (registers, company-
    * level bookings).
    *
    * `rate` = Some(col) builds the company-currency leg by dividing
    * through the document→company rate (:330-340, :415-417; pass
    * Some(lit(1.0)) for company-currency documents); None SKIPS the
    * company columns entirely — consumers reading only the document leg
    * (registers) never pay the conversion arithmetic or the extra
    * aggregate buffers. `groupingKey` / `filterTaxValues` as on
    * [[explodedTaxLines]]: None groups by tax GROUP like the footer;
    * [[byTax]] is the reference's default by-TAX generator; the filter
    * drops tax lines from the aggregation post-compute (:422).
    *
    * `record` must identify the LINE (the reference's
    * base_line['record']), not a parent document: the once-per-record
    * base rule resolves ties by tax order WITHIN one record, so a
    * record spanning several lines would collapse their bases
    * nondeterministically (the reference itself overwrites the
    * record-level base per base_line, :428-434 — same contract). */
  def aggregateTaxes(lines: DataFrame, record: Column, priceUnit: Column,
                     quantity: Column, discount: Column, chainKey: Column,
                     chains: Seq[(Int, Seq[TaxDef])],
                     taxToGroup: Map[Long, GroupDef],
                     dp: Int = 2, params: Params = Params(),
                     earlyPayDiscount: Option[(String, Double)] = None,
                     rate: Option[Column] = None,
                     groupingKey: Option[TaxDef => Long] = None,
                     filterTaxValues: Option[(Int, TaxDef) => Boolean] = None): DataFrame =
    aggregateByGroup(explodedTaxLines(lines, record, priceUnit, quantity,
      discount, chainKey, chains, taxToGroup, dp, params, earlyPayDiscount,
      companyLeg = rate, groupingKey = groupingKey,
      filterTaxValues = filterTaxValues), hasCompanyLeg = rate.nonEmpty)

  /** The reference's `tax_details_per_record` arm (:372-384) as a
    * distributed frame: one row per (record, grouping key) with base
    * counted once per record and tax amounts summed; the gid −1 row per
    * record carries its price_subtotal (the record-level base,
    * :412-417). Same single scan and explode as the footer — this is
    * the footer's FIRST groupBy level, exposed instead of discarded.
    *
    * `record` MUST be line-unique (one physical line per record id):
    * the sentinel rows all share ord −1, so an invoice-keyed record
    * over multi-line invoices would surface an ARBITRARY single line's
    * price_subtotal as the record base — silently lossy. Pre-aggregate
    * to one row per record (or keep the line id) before calling;
    * [[aggregateTaxes]] documents the same contract. `rate`,
    * `groupingKey`, `filterTaxValues` as on [[aggregateTaxes]] —
    * rate = None skips the company leg.
    *
    * SUPERSET vs the reference for records with NO surviving tax: the
    * sentinel gid −1 row is emitted for EVERY record (untaxed lines,
    * empty chains, and records whose taxes were all dropped by
    * `filterTaxValues`), whereas the reference's defaultdict
    * materializes a `tax_details_per_record` entry only inside the
    * per-tax loop (:428-434) — a record none of whose taxes survive is
    * simply ABSENT there. The global/footer level is unaffected (the
    * reference accumulates the record base BEFORE the filter loop,
    * :415-417, and so does the sentinel here); consumers wanting the
    * reference's absent-record shape filter the frame to records that
    * also carry a gid ≥ 0 row. */
  def taxDetailsPerRecord(lines: DataFrame, record: Column, priceUnit: Column,
                          quantity: Column, discount: Column, chainKey: Column,
                          chains: Seq[(Int, Seq[TaxDef])],
                          taxToGroup: Map[Long, GroupDef],
                          dp: Int = 2, params: Params = Params(),
                          earlyPayDiscount: Option[(String, Double)] = None,
                          rate: Option[Column] = None,
                          groupingKey: Option[TaxDef => Long] = None,
                          filterTaxValues: Option[(Int, TaxDef) => Boolean] = None): DataFrame =
    perRecordDetails(explodedTaxLines(lines, record, priceUnit, quantity,
      discount, chainKey, chains, taxToGroup, dp, params, earlyPayDiscount,
      companyLeg = rate, groupingKey = groupingKey,
      filterTaxValues = filterTaxValues), hasCompanyLeg = rate.nonEmpty)

  /** The cash-rounding footer arm of `_compute_tax_totals`
    * (etl_account/models/account_move.py:667-673): a move carrying a
    * 'rounding' line shows `amount_total_rounded = amount_total −
    * balance`, with the balance sign FLIPPED for out_refund / in_invoice
    * moves (:670-671); the sales/purchase wizards consume the same line
    * as `round_off = −1 · balance` (wizard/sales_report.py:169-171).
    * Returned raw — the reference rounds only in formatLang (display,
    * out of scope per SURVEY §2.1). The rounding LINE's own construction
    * (:676-770) is ORM line-write orchestration around core Odoo's
    * `account.cash.rounding.compute_difference` — the rounding-unit
    * policy is NOT part of the reference snapshot, so only its
    * observable footer arithmetic has a twin here. */
  def amountTotalRounded(totals: Totals, roundingBalance: Double,
                         moveType: String): Double = {
    val balance =
      if (moveType == "out_refund" || moveType == "in_invoice")
        -roundingBalance
      else roundingBalance
    totals.amountTotal - balance
  }

  /** Compute the tax totals of a single-chain document-line corpus.
    *
    * `record` identifies the line (the reference's base_line['record']);
    * `hasTaxes` marks lines carrying the chain (others contribute only
    * their untaxed subtotal, :342-349); `discount` is the line discount
    * percent (:273). `taxToGroup` maps every chain tax id to its group;
    * `dp` is the partner's invoice_decimal (:265-272, default 2);
    * `params` forwards to [[TaxCompute.compile]]. `manualTaxLines` are
    * (group id, company tax amount) pairs from manually edited tax lines
    * (:469-475). `earlyPayDiscount` = Some(("included"|"excluded"), pct).
    * `footerDp` overrides the FOOTER's decimal count when it differs
    * from the line dp — the reference's no-partner path takes dp from
    * `currency.decimal_places` (:446-449, domain {0,2,3} via dp_dic)
    * while each line computes at the default 2. */
  def prepareTaxTotals(lines: DataFrame, record: Column, priceUnit: Column,
                       quantity: Column, discount: Column, hasTaxes: Column,
                       chain: Seq[TaxDef], taxToGroup: Map[Long, GroupDef],
                       dp: Int = 2, params: Params = Params(),
                       earlyPayDiscount: Option[(String, Double)] = None,
                       manualTaxLines: Seq[(Long, Double)] = Nil,
                       footerDp: Option[Int] = None): Totals =
    prepareTaxTotalsMulti(lines, record, priceUnit, quantity, discount,
      when(hasTaxes, lit(1)).otherwise(lit(0)), Seq(1 -> chain), taxToGroup,
      dp, params, earlyPayDiscount, manualTaxLines, footerDp)

  /** [[prepareTaxTotals]] over a corpus mixing SEVERAL tax chains — the
    * reference's per-line `base_line['taxes']` (:277): each distinct
    * chain compiles once, `chainKey` selects per row, the whole footer
    * stays one scan. A key matching no chain behaves as the taxes-empty
    * branch. */
  def prepareTaxTotalsMulti(lines: DataFrame, record: Column,
                            priceUnit: Column, quantity: Column,
                            discount: Column, chainKey: Column,
                            chains: Seq[(Int, Seq[TaxDef])],
                            taxToGroup: Map[Long, GroupDef],
                            dp: Int = 2, params: Params = Params(),
                            earlyPayDiscount: Option[(String, Double)] = None,
                            manualTaxLines: Seq[(Long, Double)] = Nil,
                            footerDp: Option[Int] = None): Totals = {
    // the footer reads the DOCUMENT-currency leg only (:463-467), so
    // its explode never builds the company fields
    val perGroup = footerAggregate(lines, record, priceUnit, quantity,
        discount, chainKey, chains, taxToGroup, dp, params, earlyPayDiscount)
      .collect() // bounded by the tax-group dimension (+1 sentinel row)
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    layoutTotals(perGroup, taxToGroup, footerDp.getOrElse(dp), params,
      manualTaxLines)
  }

  /** Footers for SEVERAL document batches in ONE plan — the wizard shape
    * (each register iterates invoices/moves and reads
    * `_compute_tax_totals` per batch): `slice` keys the batch (move
    * type, journal, company…), and the result maps slice → [[Totals]],
    * each laid out by the SAME `_prepare_tax_totals` arithmetic as
    * [[prepareTaxTotalsMulti]]. One scan → explode → (slice, record,
    * group) → (slice, group); only slices × (groups + 1) rows reach the
    * driver, so a corpus of millions of documents across a bounded
    * slice dimension still runs as one distributed plan instead of one
    * job per batch. `manualBySlice` carries each slice's manual
    * tax-line overrides (:469-475); every key must name a slice PRESENT
    * in the corpus — an unmatched key rejects loudly instead of
    * dropping the override. The reject is deliberately strict even
    * though an empty slice's override would be an arithmetic NO-OP
    * anyway (manual amounts only REPLACE a group row the aggregation
    * produced, :469-475 — here and in the reference an override for an
    * absent group is dropped, so nothing is lost by rejecting): a
    * mistyped key and a legitimately-empty slice are indistinguishable
    * from the data, and silent typo-shaped number loss is the worse
    * failure for an engine whose output is financial. A fixed-dimension
    * caller whose slices may legitimately be empty intersects its
    * override map with the slices it knows are present. A slice with no
    * records is ABSENT from the result map (there is no row to learn it
    * from) — callers enumerating a fixed slice dimension should treat
    * absence as the all-zero footer, which is what the whole-corpus API
    * returns on an empty frame. The slice column must be integral (loud
    * type check; null slice values reject at collect time). */
  def prepareTaxTotalsSliced(lines: DataFrame, slice: Column, record: Column,
                             priceUnit: Column, quantity: Column,
                             discount: Column, chainKey: Column,
                             chains: Seq[(Int, Seq[TaxDef])],
                             taxToGroup: Map[Long, GroupDef],
                             dp: Int = 2, params: Params = Params(),
                             earlyPayDiscount: Option[(String, Double)] = None,
                             manualBySlice: Map[Long, Seq[(Long, Double)]] = Map(),
                             footerDp: Option[Int] = None): Map[Long, Totals] = {
    val perSliceGroup = footerAggregateSliced(lines, slice, record,
      priceUnit, quantity, discount, chainKey, chains, taxToGroup, dp,
      params, earlyPayDiscount)
      .collect() // bounded by slices × (tax-group dimension + 1)
      .map { r =>
        // the type check in footerAggregateSliced rules out non-integral
        // slices; a NULL value would still group under a null key (and
        // getLong would read it as 0, merging it into slice 0) — reject
        require(!r.isNullAt(0),
          "null slice key: every line must carry a non-null slice value")
        (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))
      }.toMap
    // a mistyped slice key in manualBySlice would otherwise vanish
    // silently — the override applies to no batch and nothing signals it
    val unusedManual = manualBySlice.keySet -- perSliceGroup.keys.map(_._1)
    require(unusedManual.isEmpty,
      s"manualBySlice keys ${unusedManual.toSeq.sorted.mkString(", ")} " +
        "match no slice in the corpus — manual tax-line overrides would " +
        "be dropped silently (empty slices are ABSENT from the result; " +
        "apply their overrides to the all-zero footer driver-side)")
    perSliceGroup.keys.map(_._1).toSeq.distinct.map { s =>
      val perGroup = perSliceGroup.collect {
        case ((`s`, gid), bt) => gid -> bt
      }
      s -> layoutTotals(perGroup, taxToGroup, footerDp.getOrElse(dp), params,
        manualBySlice.getOrElse(s, Nil))
    }.toMap
  }

  /** [[prepareTaxTotalsSliced]]'s distributed side, lazy — exposed so
    * plan audits can pin the one-scan shape. The slice key rides INSIDE
    * the record struct through the explode (every physical line belongs
    * to exactly one batch), so the per-record level is the usual
    * (rec, gid) groupBy and the second level regroups on the slice
    * field it carries. */
  private[graft] def footerAggregateSliced(lines: DataFrame, slice: Column,
                                           record: Column, priceUnit: Column,
                                           quantity: Column, discount: Column,
                                           chainKey: Column,
                                           chains: Seq[(Int, Seq[TaxDef])],
                                           taxToGroup: Map[Long, GroupDef],
                                           dp: Int, params: Params,
                                           earlyPayDiscount: Option[(String, Double)])
      : DataFrame = {
    // the slice key is widened to long for the driver-side map; a
    // string/double/date slice would survive the cast as nulls or
    // truncated values and land rows under the wrong batch silently —
    // reject non-integral slice types at plan-build time
    val sliceType = lines.select(slice).schema.head.dataType
    require(sliceType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"slice column must be an integral type (byte/short/int/long), " +
      s"got $sliceType — cast explicitly only if the conversion is " +
      "genuinely lossless for every row")
    val exploded = explodedTaxLines(lines,
      struct(slice.cast("long").as("s"), record.as("r")), priceUnit,
      quantity, discount, chainKey, chains, taxToGroup, dp, params,
      earlyPayDiscount, companyLeg = None)
    perRecordDetails(exploded, hasCompanyLeg = false)
      .groupBy(col("rec.s").as("slice"), col("gid"))
      .agg(sum(col("base_amount")).as("base_amount"),
        sum(col("tax_amount")).as("tax_amount"))
  }

  /** `_prepare_tax_totals`' driver-side layout (:441-530) over a
    * collected per-group map — dimension-sized, shared by the
    * whole-corpus and sliced footers so the two can never diverge. */
  private def layoutTotals(perGroup: Map[Long, (Double, Double)],
                           taxToGroup: Map[Long, GroupDef], fdp: Int,
                           params: Params,
                           manualTaxLines: Seq[(Long, Double)]): Totals = {
    def fRound(v: Double): Double = footerRound(v, fdp)
    val amountUntaxedRaw = perGroup.get(-1L).map(_._1).getOrElse(0.0)
    val groupTotals = perGroup.keys.filter(_ >= 0).toSeq
      .map { gid =>
        val g = taxToGroup.values.find(_.id == gid).getOrElse(
          throw new IllegalStateException(s"group $gid missing from dim"))
        val (b, t) = perGroup(gid)
        // manual tax-line edits replace the group's tax amount (:469-475)
        val manual = manualTaxLines.filter(_._1 == gid)
        val tax = if (manual.nonEmpty) manual.map(_._2).sum else t
        GroupTotal(g, fRound(b), fRound(tax))
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
      val st = Subtotal(title, fRound(amountUntaxedRaw + amountTax))
      amountTax += groupsBySubtotal(title).map(_.taxAmount).sum
      st
    }
    val amountUntaxed = fRound(amountUntaxedRaw)
    // :515-517 — amount_tax and amount_total take ONLY the float_round
    // step (dp_tools grid): at fdp 0 they stay on the CENT grid while
    // the group/subtotal/untaxed values round to integers
    val taxGridDec = if (fdp == 0) 2 else fdp
    val amountTaxR = rndAt(amountTax, taxGridDec)
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
      rndAt(amountUntaxed + amountTaxR, taxGridDec), groupTotals, subtotals,
      order, displayTaxBase)
  }
}
