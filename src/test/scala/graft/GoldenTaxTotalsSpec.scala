package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TaxCompute.{Params, TaxDef}
import graft.report.TaxTotals
import graft.report.TaxTotals.{GroupDef, GroupTotal, Subtotal}

/** The invoice tax-totals summary pinned to the reference algorithm
  * (`_aggregate_taxes` + `_prepare_tax_totals`,
  * etl_account/models/account_tax.py:354-530): the no-double-count rule
  * for taxes sharing a base within one group, the first-base-in-tax-order
  * tie-break, the per-record (not global) base accumulation, the subtotal
  * partition by preceding_subtotal with its running total semantics
  * (:503-513), manual tax-line overrides (:469-475), partner 3-decimal
  * rounding (dp_dic :443-449), untaxed-line contributions (:342-349),
  * the display_tax_base rule (:519-520), and the rejection of the broken
  * early-pay 'excluded' branch (:307-324). */
class GoldenTaxTotalsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** (record, price_unit, quantity, discount, has_taxes) */
  private def linesDf(rows: Seq[(Long, Double, Double, Double, Boolean)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("rec", "price", "qty", "disc", "taxed")
  }

  private def totals(rows: Seq[(Long, Double, Double, Double, Boolean)],
                     chain: Seq[TaxDef], groups: Map[Long, GroupDef],
                     dp: Int = 2, params: Params = Params(),
                     manual: Seq[(Long, Double)] = Nil,
                     epd: Option[(String, Double)] = None): TaxTotals.Totals =
    TaxTotals.prepareTaxTotals(linesDf(rows), col("rec"), col("price"),
      col("qty"), col("disc"), col("taxed"), chain, groups, dp, params,
      epd, manual)

  private val G1 = GroupDef(1, "Taxes", sequence = 1)
  private val G2 = GroupDef(2, "Withholding", sequence = 2,
    precedingSubtotal = Some("Tax withholding"))

  test("two taxes sharing one group count the base ONCE per line (:393-404)") {
    val chain = Seq(
      TaxDef(10, "10%", "percent", 10.0, sequence = 1),
      TaxDef(20, "20%", "percent", 20.0, sequence = 2))
    val t = totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain,
      Map(10L -> G1, 20L -> G1))
    // base 1000 (not 2000), tax 100 + 200
    assert(t.groups == Seq(GroupTotal(G1, 1000.0, 300.0)))
    assert(t.amountUntaxed == 1000.0 && t.amountTax == 300.0
      && t.amountTotal == 1300.0)
    assert(t.subtotals == Seq(Subtotal("Untaxed Amount", 1000.0)))
    // one group, base == untaxed → no separate base column (:519-520)
    assert(!t.displayTaxBase)
  }

  test("the once-per-record base is the FIRST tax line's in tax order (include_base chain)") {
    // 20% include_base_amount then 10%: the group's base must stay the
    // ORIGINAL 1000 (the first tax's base), not the 1200 the second tax
    // computes on
    val chain = Seq(
      TaxDef(20, "20%", "percent", 20.0, includeBaseAmount = true, sequence = 1),
      TaxDef(10, "10%", "percent", 10.0, sequence = 2))
    val t = totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain,
      Map(20L -> G1, 10L -> G1))
    assert(t.groups == Seq(GroupTotal(G1, 1000.0, 320.0)))
    assert(t.amountTotal == 1320.0)
  }

  test("the base adds once per RECORD, not once per group (two lines, same group)") {
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val t = totals(Seq((1L, 1000.0, 1.0, 0.0, true), (2L, 500.0, 1.0, 0.0, true)),
      chain, Map(10L -> G1))
    assert(t.groups == Seq(GroupTotal(G1, 1500.0, 150.0)))
  }

  test("subtotal partition: each subtotal shows untaxed + the EARLIER taxes (:503-513)") {
    // the classic two-bucket footer: 21% under the default bucket, a 10%
    // withholding under its own 'Tax withholding' subtotal
    val chain = Seq(
      TaxDef(21, "21%", "percent", 21.0, sequence = 1),
      TaxDef(5, "wh", "percent", 10.0, sequence = 2))
    val t = totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain,
      Map(21L -> G1, 5L -> G2))
    assert(t.subtotalsOrder == Seq("Untaxed Amount", "Tax withholding"))
    assert(t.subtotals == Seq(
      Subtotal("Untaxed Amount", 1000.0),
      // the withholding subtotal includes the 21% booked BEFORE it
      Subtotal("Tax withholding", 1210.0)))
    assert(t.groups == Seq(
      GroupTotal(G1, 1000.0, 210.0), GroupTotal(G2, 1000.0, 100.0)))
    assert(t.amountTax == 310.0 && t.amountTotal == 1310.0)
    assert(t.displayTaxBase) // two groups (:520)
  }

  test("an untaxed line adds to amount_untaxed only (:342-349)") {
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val t = totals(Seq(
      (1L, 1000.0, 1.0, 0.0, true),
      (2L, 250.0, 2.0, 0.0, false)), chain, Map(10L -> G1))
    assert(t.amountUntaxed == 1500.0)
    assert(t.groups == Seq(GroupTotal(G1, 1000.0, 100.0)))
    assert(t.amountTotal == 1600.0)
    // one group whose base (1000) differs from untaxed (1500) → display
    assert(t.displayTaxBase)
  }

  test("the line discount applies before the chain (:273)") {
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val t = totals(Seq((1L, 1000.0, 1.0, 20.0, true)), chain, Map(10L -> G1))
    assert(t.amountUntaxed == 800.0)
    assert(t.groups == Seq(GroupTotal(G1, 800.0, 80.0)))
  }

  test("manual tax lines replace the group's tax amount (:469-475)") {
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val t = totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain,
      Map(10L -> G1), manual = Seq((1L, 99.0)))
    assert(t.groups == Seq(GroupTotal(G1, 1000.0, 99.0)))
    // the subtotal accumulation uses the OVERRIDDEN amount
    assert(t.amountTax == 99.0 && t.amountTotal == 1099.0)
    // a manual line for another group changes nothing
    val t2 = totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain,
      Map(10L -> G1), manual = Seq((2L, 99.0)))
    assert(t2.groups == Seq(GroupTotal(G1, 1000.0, 100.0)))
  }

  test("partner 3-decimal precision flows through dp_dic (:443-449)") {
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val t = totals(Seq((1L, 5.13, 1.0, 0.0, true)), chain, Map(10L -> G1),
      dp = 3, params = Params(taxDecimals = Some(3)))
    assert(t.groups == Seq(GroupTotal(G1, 5.13, 0.513)))
    assert(t.amountTotal == 5.643)
  }

  test("early-pay 'included' scales the price; 'excluded' is rejected (broken in the reference)") {
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val t = totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain,
      Map(10L -> G1), epd = Some(("included", 2.0)))
    assert(t.amountUntaxed == 980.0)
    assert(t.groups == Seq(GroupTotal(G1, 980.0, 98.0)))
    val ex = intercept[IllegalArgumentException] {
      totals(Seq((1L, 1000.0, 1.0, 0.0, true)), chain, Map(10L -> G1),
        epd = Some(("excluded", 2.0)))
    }
    assert(ex.getMessage.contains("excluded"))
  }

  test("display_tax_base compares at the CURRENCY grid (:524), not a hardcoded cent grid") {
    // taxed 5.000 + untaxed 0.004 at a 3-decimal currency: the group
    // base (5.000) and amount_untaxed (5.004) are EQUAL on the cent
    // grid but DIFFERENT on the currency's mill grid —
    // currency.compare_amounts must see the mill-level gap
    val chain = Seq(TaxDef(10, "10%", "percent", 10.0))
    val rows = Seq((1L, 5.0, 1.0, 0.0, true), (2L, 0.004, 1.0, 0.0, false))
    val t3 = totals(rows, chain, Map(10L -> G1), dp = 3,
      params = Params(precision = 3, taxDecimals = Some(3)))
    assert(t3.amountUntaxed == 5.004
      && t3.groups == Seq(GroupTotal(G1, 5.0, 0.5)))
    assert(t3.displayTaxBase,
      "a mill-level base/untaxed gap must flip the flag at precision 3")
    // at a 2-decimal currency the same corpus collapses: the untaxed
    // mite rounds away at the currency grid and the flag stays down
    val t2 = totals(rows, chain, Map(10L -> G1), dp = 3,
      params = Params(precision = 2, taxDecimals = Some(3)))
    assert(!t2.displayTaxBase)
  }

  test("group order follows (sequence, id); negative quantities re-sign (:479, :92-99)") {
    val g9 = GroupDef(9, "Late", sequence = 1) // same sequence as G1, higher id
    val chain = Seq(
      TaxDef(10, "a", "percent", 10.0, sequence = 1),
      TaxDef(20, "b", "percent", 20.0, sequence = 2))
    val t = totals(Seq((1L, 100.0, -1.0, 0.0, true)), chain,
      Map(10L -> g9, 20L -> G1))
    assert(t.groups.map(_.group.id) == Seq(1L, 9L))
    assert(t.groups == Seq(
      GroupTotal(G1, -100.0, -20.0), GroupTotal(g9, -100.0, -10.0)))
    assert(t.amountUntaxed == -100.0 && t.amountTotal == -130.0)
  }
}
