package graft.report

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.engine.TaxCompute
import graft.engine.TaxCompute.{Params, TaxDef}

/** The invoice-line totals projection — `price_subtotal` / `price_total`
  * (reference `_compute_totals`, etl_account/models/account_move_line
  * .py:316-362, and the identical discounted-unit derivation in
  * `_convert_to_tax_base_line_dict`, :366-396): the per-line numbers
  * every document view shows, re-derived from the tax chain.
  *
  * Computation (:327-349):
  *  1. the percent discount scales the unit price, rounded at the
  *     partner's invoice decimals;
  *  2. the FLAT `discount_value` (a per-unit amount, not a percent)
  *     subtracts AFTER the percent discount, rounded again;
  *  3. with taxes: `compute_all(discounted_unit, quantity)` under the
  *     partner precision — `price_subtotal` = total_excluded,
  *     `price_total` = total_included, each re-rounded;
  *  4. without taxes: both equal `round(quantity · discounted_unit)`.
  *
  * The reference rounds every step twice — `float_round(x, dp_dic[dec])`
  * then `round(x, dec)` with dp_dic = {2: 0.01, 3: 0.001} (:317, :328-331)
  * — two spellings of the same half-up rounding at `dec` decimals, so the
  * compiled form keeps ONE `round(x, dec)` per step (same value, half the
  * expression depth).
  *
  * Everything unrolls into the same codegen'd projection as
  * [[graft.engine.TaxCompute]] — no UDF, no driver loop; the per-partner
  * decimal selection compiles the chain once per distinct decimal (the
  * dp_dic domain is {2, 3}) and selects per row, so a mixed-partner scan
  * stays one pass. */
object LineTotals {

  final case class Totals(priceSubtotal: Column, priceTotal: Column)

  /** The discounted unit price (:327-331): percent discount, round,
    * flat `discount_value` subtraction, round again. */
  def discountedUnit(priceUnit: Column, discountPct: Column,
                     discountValue: Column, dec: Int): Column = {
    val afterPct = round(priceUnit * (lit(1.0) - discountPct / 100.0), dec)
    round(afterPct - discountValue, dec)
  }

  /** Line totals at a FIXED partner decimal count (`dec` ∈ dp_dic's
    * domain {2, 3}). `hasTaxes` selects the taxed branch per row
    * (:337-351); `currencyPrecision` is the currency rounding inside
    * compute_all. A dp=0 partner CANNOT reach the line computation in
    * the reference: `invoice_decimal or False` (:318-321) treats the
    * falsy 0 as absent and falls back to 2, and dp_dic (:317) has no 0
    * key besides — so out-of-domain decimals reject loudly here
    * (callers model a 0-decimal partner by passing 2, exactly like the
    * reference's coercion). */
  def compute(taxes: Seq[TaxDef], priceUnit: Column, quantity: Column,
              discountPct: Column, discountValue: Column, hasTaxes: Column,
              dec: Int, currencyPrecision: Int = 2): Totals = {
    require(dec == 2 || dec == 3,
      s"partner decimal count $dec is outside _compute_totals' dp_dic " +
        "domain {2, 3} (account_move_line.py:317); the reference coerces " +
        "a falsy 0 to 2 (:318-321) — pass 2 for a 0-decimal partner")
    val unit = discountedUnit(priceUnit, discountPct, discountValue, dec)
    val subtotal = round(quantity * unit, dec)
    val c = TaxCompute.compile(taxes, unit, quantity,
      Params(precision = currencyPrecision, taxDecimals = Some(dec)))
    Totals(
      when(hasTaxes, round(c.totalExcluded, dec)).otherwise(subtotal),
      when(hasTaxes, round(c.totalIncluded, dec)).otherwise(subtotal))
  }

  /** Line totals with the PER-ROW partner decimal selection (:317-322:
    * partner.invoice_decimal, default 2): the chain compiles once per
    * decimal and `dec3` picks per row — one scan for a mixed-partner
    * fact. */
  def computePerPartner(taxes: Seq[TaxDef], priceUnit: Column,
                        quantity: Column, discountPct: Column,
                        discountValue: Column, hasTaxes: Column,
                        dec3: Column, currencyPrecision: Int = 2): Totals = {
    val d2 = compute(taxes, priceUnit, quantity, discountPct, discountValue,
      hasTaxes, 2, currencyPrecision)
    val d3 = compute(taxes, priceUnit, quantity, discountPct, discountValue,
      hasTaxes, 3, currencyPrecision)
    Totals(
      when(dec3, d3.priceSubtotal).otherwise(d2.priceSubtotal),
      when(dec3, d3.priceTotal).otherwise(d2.priceTotal))
  }
}
