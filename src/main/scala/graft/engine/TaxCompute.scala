package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The tax computation engine — the reference's `compute_all`
  * (etl_account/models/account_tax.py:58-261) re-expressed as a COMPILER
  * from a static tax chain to native Column expressions, so recomputing
  * taxes over a corpus of document lines is one codegen'd projection
  * instead of a per-row interpreter:
  *
  *  1. the chain is flattened (group taxes replaced by their children in
  *     sequence order) BEFORE compilation (:65);
  *  2. a backward price-include pass derives `total_excluded`
  *     (:105-146): price-included percent/division/fixed amounts
  *     accumulate and `recompute_base` peels them off at every
  *     include_base_amount boundary; the pre-peel base is remembered as
  *     a CHECKPOINT per position so the forward pass can reach the
  *     included total exactly instead of re-rounding toward it;
  *  3. the forward pass (:148-249) computes each tax on the running
  *     base (or on `total_excluded` when the tax is not base-affected),
  *     price-included taxes take `checkpoint − (base + cumulated)` when
  *     a checkpoint exists (:173-177), include_base_amount taxes add
  *     their factorized amount to the running base (:240-243);
  *  4. each tax's amount splits over its repartition lines with the
  *     reference's rounding-error distribution (:203-214): line amounts
  *     round individually, the residual error spreads one rounding unit
  *     at a time over the leading lines.
  *
  * Since the control flow depends only on the STATIC chain, every
  * accumulator unrolls into a Column expression over (price_unit,
  * quantity) — whole-stage codegen end to end, no UDF, no driver loop
  * over rows. Negative bases compute on the absolute value and re-sign
  * at the end (:92-99).
  */
object TaxCompute {

  /** One repartition line (factor in percent, like the reference). */
  final case class Repartition(factor: Double, account: Option[String] = None,
                               useInTaxClosing: Boolean = true)

  /** A flattened (non-group) tax. `amountType` ∈ percent | division |
    * fixed. Group taxes are flattened by the caller — [[flatten]]. */
  final case class TaxDef(id: Long, name: String, amountType: String,
                          amount: Double, priceInclude: Boolean = false,
                          includeBaseAmount: Boolean = false,
                          isBaseAffected: Boolean = true, sequence: Int = 0,
                          repartition: Seq[Repartition] = Seq(Repartition(100.0)))

  /** A group tax for [[flatten]]. */
  final case class TaxGroup(children: Seq[TaxDef])

  /** Flatten a mixed chain (taxes and groups) in sequence order (:65 —
    * the reference's flatten_taxes_hierarchy). */
  def flatten(chain: Seq[Either[TaxDef, TaxGroup]]): Seq[TaxDef] =
    chain.flatMap {
      case Left(t) => Seq(t)
      case Right(g) => g.children
    }.sortBy(_.sequence)

  /** One compiled repartition output. */
  final case class TaxLine(tax: TaxDef, repartition: Repartition,
                           amount: Column, base: Column)

  final case class Compiled(totalExcluded: Column, totalIncluded: Column,
                            lines: Seq[TaxLine])

  /** Compile the chain at currency `precision` decimals. `priceUnit` and
    * `quantity` are input Columns; `isRefund` selects nothing here (the
    * reference's refund repartitions mirror the invoice ones in every
    * transcribed fixture — callers pass the refund repartition set in
    * `TaxDef.repartition` when it differs). */
  def compile(taxes: Seq[TaxDef], priceUnit: Column, quantity: Column,
              precision: Int = 2): Compiled = {
    val unit = math.pow(10.0, -precision)
    def rnd(c: Column): Column = round(c, precision)

    val rawBase = rnd(priceUnit * quantity)
    val sign = when(rawBase < 0, lit(-1.0)).otherwise(lit(1.0))
    val absBase = abs(rawBase)

    def factorSum(t: TaxDef): Double = t.repartition.map(_.factor).sum / 100.0

    // ---- backward price-include pass (:105-146) -----------------------
    // base/incl* are Column accumulators; the checkpoint map remembers
    // the pre-peel base per position
    def recomputeBase(b: Column, fixedAmt: Column, pct: Double, div: Double): Column =
      (b - fixedAmt) / (1.0 + pct / 100.0) * ((100.0 - div) / 100.0)

    var b: Column = absBase
    var inclFixed: Column = lit(0.0)
    var inclPct = 0.0
    var inclDiv = 0.0
    var storeCheckpoint = true
    val checkpoints = scala.collection.mutable.Map[Int, Column]()
    for ((tax, i) <- taxes.zipWithIndex.reverse) {
      val f = factorSum(tax)
      if (tax.includeBaseAmount) {
        b = recomputeBase(b, inclFixed, inclPct, inclDiv)
        inclFixed = lit(0.0); inclPct = 0.0; inclDiv = 0.0
        storeCheckpoint = true
      }
      if (tax.priceInclude) {
        tax.amountType match {
          case "percent" => inclPct += tax.amount * f
          case "division" => inclDiv += tax.amount * f
          case "fixed" => inclFixed = inclFixed + abs(quantity) * (tax.amount * f)
          case other => throw new IllegalArgumentException(s"amount_type $other")
        }
        if (storeCheckpoint && tax.amount != 0.0) {
          checkpoints(i) = b
          storeCheckpoint = false
        }
      }
    }
    val totalExcluded = rnd(recomputeBase(b, inclFixed, inclPct, inclDiv))

    // ---- forward pass (:148-249) --------------------------------------
    // the reference forces force_price_include=False here (:179): the
    // backward pass already extracted the excluded base, so every tax
    // computes with the price-EXCLUDED formulas
    def computeAmount(tax: TaxDef, baseAmt: Column): Column = tax.amountType match {
      case "fixed" => abs(quantity) * tax.amount
      case "percent" => baseAmt * (tax.amount / 100.0)
      case "division" =>
        if (1.0 - tax.amount / 100.0 == 0.0) lit(0.0)
        else baseAmt / (1.0 - tax.amount / 100.0) - baseAmt
    }

    var base: Column = totalExcluded
    var totalIncluded: Column = totalExcluded
    var cumulatedIncl: Column = lit(0.0)
    var skipCheckpoint = false
    val lines = scala.collection.mutable.ArrayBuffer[TaxLine]()
    for ((tax, i) <- taxes.zipWithIndex) {
      val f = factorSum(tax)
      val taxBase = if (tax.priceInclude || tax.isBaseAffected) base else totalExcluded
      val taxAmount0 =
        if (!skipCheckpoint && tax.priceInclude && checkpoints.contains(i) && f != 0.0) {
          val a = checkpoints(i) - (base + cumulatedIncl)
          cumulatedIncl = lit(0.0)
          a
        } else computeAmount(tax, taxBase)
      val taxAmount = rnd(taxAmount0)
      val factorized = rnd(taxAmount * f)
      if (tax.priceInclude && !checkpoints.contains(i))
        cumulatedIncl = cumulatedIncl + factorized

      // repartition split with the rounding-error distribution (:203-214)
      val lineAmounts = tax.repartition.map(r => rnd(taxAmount * (r.factor / 100.0)))
      val totalError = rnd(factorized - lineAmounts.reduce(_ + _))
      // int(|err| / unit) with an epsilon against float-division dust
      val steps = floor(abs(totalError) / unit + 1e-7).cast("int")
      val perStep = when(steps > 0, rnd(totalError / steps)).otherwise(lit(0.0))
      for ((r, j) <- tax.repartition.zipWithIndex) {
        val amt = lineAmounts(j) + when(lit(j) < steps, perStep).otherwise(lit(0.0))
        lines += TaxLine(tax, r, sign * amt, rnd(sign * taxBase))
      }

      if (tax.includeBaseAmount) {
        base = base + factorized
        if (!tax.priceInclude) skipCheckpoint = true
      }
      totalIncluded = totalIncluded + factorized
    }
    Compiled(sign * totalExcluded, rnd(sign * totalIncluded), lines.toSeq)
  }
}
