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
  * at the end (:92-99). [[Params]] carries the rounding/sign knobs
  * (partner tax decimals, round_globally, fixed_multiplicator); the
  * 'python' amount_type is rejected at compile time by design (see the
  * note inside [[compile]]).
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

  /** A group tax for [[flatten]]; `sequence` positions the GROUP in the
    * top-level chain (its children do not compete with outer taxes). */
  final case class TaxGroup(children: Seq[TaxDef], sequence: Int = 0)

  /** Flatten a mixed chain (taxes and groups) in sequence order (:65 —
    * the reference's flatten_taxes_hierarchy): ONLY the top level sorts
    * by sequence; a group's children expand contiguously AT the group's
    * position, ordered by their own sequence among themselves — a child
    * whose sequence interleaves with an outer tax's must NOT be re-sorted
    * into the outer chain (it would break include_base_amount chaining). */
  def flatten(chain: Seq[Either[TaxDef, TaxGroup]]): Seq[TaxDef] =
    chain.sortBy {
      case Left(t) => t.sequence
      case Right(g) => g.sequence
    }.flatMap {
      case Left(t) => Seq(t)
      case Right(g) => g.children.sortBy(_.sequence)
    }

  /** One compiled repartition output. */
  final case class TaxLine(tax: TaxDef, repartition: Repartition,
                           amount: Column, base: Column)

  final case class Compiled(totalExcluded: Column, totalIncluded: Column,
                            lines: Seq[TaxLine])

  /** compute_all's rounding and sign knobs beyond the chain itself
    * (account_tax.py:58-98):
    *  - `precision`: CURRENCY decimals (currency.rounding = 10^-precision)
    *    — rounds the raw base (:89) and sizes the repartition rounding-
    *    error step, which stays in CURRENCY units (:206) even when the
    *    tax precision differs;
    *  - `taxDecimals`: the partner's invoice_decimal (`dp_dic` {2: 0.01,
    *    3: 0.001}, :70-74) — the float_round precision for every tax
    *    amount; None = no partner, fall back to the currency precision;
    *  - `roundGlobally`: company tax_calculation_rounding_method =
    *    'round_globally' (:79-84) — the tax precision gains 5 decimals
    *    (`prec *= 1e-5`), deferring real rounding to the caller's totals;
    *  - `fixedMultiplicator`: scales fixed amounts by its ABSOLUTE value
    *    (:127 and `_compute_amount`) and supplies the sign when the
    *    rounded base is zero (:94-95). */
  final case class Params(precision: Int = 2, taxDecimals: Option[Int] = None,
                          roundGlobally: Boolean = false,
                          fixedMultiplicator: Double = 1.0)

  /** Compile the chain at currency `precision` decimals. `priceUnit` and
    * `quantity` are input Columns; `isRefund` selects nothing here (the
    * reference's refund repartitions mirror the invoice ones in every
    * transcribed fixture — callers pass the refund repartition set in
    * `TaxDef.repartition` when it differs). */
  def compile(taxes: Seq[TaxDef], priceUnit: Column, quantity: Column,
              precision: Int = 2): Compiled =
    compile(taxes, priceUnit, quantity, Params(precision = precision))

  def compile(taxes: Seq[TaxDef], priceUnit: Column, quantity: Column,
              params: Params): Compiled =
    compile(taxes, priceUnit, quantity, params, (_, c) => c)

  /** [[compile]] with a MATERIALIZATION hook (r18 optimization): `mat` is
    * called at every sequential accumulation point (raw base, sign, the
    * excluded total, each tax's rounded amount / factorized amount /
    * rounding-error distribution scalars) with a stable name and the
    * expression; it returns the Column the rest of the compilation should
    * reference. The default is identity — one fully inlined expression
    * tree, semantically what this compiler always produced. A caller that
    * instead REGISTERS each expression as a named projection column and
    * returns an attribute reference (see
    * [[graft.report.TaxTotals.explodedTaxLines]]) cuts the tree at every
    * hook point: the same arithmetic over the same values, but each hook
    * value is computed ONCE per row and shared by reference instead of
    * being re-inlined into every consumer. Without the cut, a two-tax
    * chain with a company leg unrolls to a ~3000-node generator tree
    * whose single generated method exceeds the JVM's JIT compilation
    * threshold (measured: 842 KB of codegen, 58 KB max method bytecode —
    * HotSpot refuses methods > 8 KB, so the hot path ran INTERPRETED at
    * ~50 µs/row). Pure restructuring: every hook value is bit-identical
    * (same double ops in the same order), only the sharing changes. */
  def compile(taxes: Seq[TaxDef], priceUnit: Column, quantity: Column,
              params: Params, mat: (String, Column) => Column): Compiled = {
    // 'python' (safe-eval'd per-row formulas) is OUT OF SCOPE by design
    // (SURVEY §4.3: no embedded interpreter in public Spark); the compiler
    // rejects the chain HERE, at compile time, so a caller porting such a
    // tax fails loudly instead of computing a wrong amount. 'group' never
    // reaches compile ([[flatten]] expands groups first).
    taxes.find(t => !Set("fixed", "percent", "division").contains(t.amountType))
      .foreach(t => throw new IllegalArgumentException(
        s"amount_type '${t.amountType}' (tax ${t.id}) is unsupported by " +
          "the column compiler — python-formula taxes are out of " +
          "public-Spark scope; flatten group taxes before compiling"))
    // currency rounding (:89, :144, :206) vs tax-amount float_round
    // precision (:70-84, :145, :183-207): two distinct units
    val unit = math.pow(10.0, -params.precision)
    def rndC(c: Column): Column = round(c, params.precision)
    val precDec = params.taxDecimals.getOrElse(params.precision) +
      (if (params.roundGlobally) 5 else 0)
    def rnd(c: Column): Column = round(c, precDec)
    val absMult = math.abs(params.fixedMultiplicator)

    val rawBase = mat("raw_base", rndC(priceUnit * quantity))
    // zero base: the fixed multiplicator supplies the sign (:94-95)
    val zeroSign = if (params.fixedMultiplicator < 0) -1.0 else 1.0
    val sign = mat("sign", when(rawBase === 0.0, lit(zeroSign))
      .otherwise(when(rawBase < 0, lit(-1.0)).otherwise(lit(1.0))))
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
          case _ => // "fixed" — the only type left after the upfront check
            // :127 — |quantity| · amount · factor · |fixed_multiplicator|
            inclFixed = inclFixed + abs(quantity) * (tax.amount * f * absMult)
        }
        if (storeCheckpoint && tax.amount != 0.0) {
          checkpoints(i) = b
          storeCheckpoint = false
        }
      }
    }
    // :144-145 — currency.round FIRST, then float_round at the tax
    // precision (a no-op when they agree; both kept for fidelity)
    val totalExcluded =
      mat("total_excluded", rnd(rndC(recomputeBase(b, inclFixed, inclPct, inclDiv))))

    // ---- forward pass (:148-249) --------------------------------------
    // the reference forces force_price_include=False here (:179): the
    // backward pass already extracted the excluded base, so every tax
    // computes with the price-EXCLUDED formulas
    // fixed amounts follow the reference's `_compute_amount` (Odoo core,
    // public AGPL source): `copysign(quantity, base) · amount · |mult|`
    // when the base is nonzero, else `quantity · amount · |mult|`. On the
    // abs path the base is ≥ 0, so copysign(quantity, base) = |quantity|
    // and the amount KEEPS ITS OWN SIGN — a negative fixed amount is a
    // rebate and must stay negative (an abs() here would also break the
    // backward pass's raw-amount accumulation at :127: a price-included
    // negative fixed tax would no longer round-trip to the included
    // total; GoldenTaxComputeSpec pins that invariant).
    def computeAmount(tax: TaxDef, baseAmt: Column): Column = tax.amountType match {
      case "fixed" =>
        val amt = tax.amount * absMult
        when(baseAmt =!= 0.0, abs(quantity) * amt).otherwise(quantity * amt)
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
      val taxAmount = mat(s"tax_amount_$i", rnd(taxAmount0))
      val factorized = mat(s"factorized_$i", rnd(taxAmount * f))
      if (tax.priceInclude && !checkpoints.contains(i))
        cumulatedIncl = cumulatedIncl + factorized

      // repartition split with the rounding-error distribution (:203-214)
      val lineAmounts = tax.repartition.map(r => rnd(taxAmount * (r.factor / 100.0)))
      val totalError = rnd(factorized - lineAmounts.reduce(_ + _))
      // int(|err| / unit) with an epsilon against float-division dust
      val steps = mat(s"steps_$i", floor(abs(totalError) / unit + 1e-7).cast("int"))
      val perStep =
        mat(s"per_step_$i", when(steps > 0, rnd(totalError / steps)).otherwise(lit(0.0)))
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
