package graft.engine

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The report evaluation lifecycle (SURVEY §3.1,
  * account_reports/models/account_report.py `get_report_informations` →
  * `_get_options` → `_compute_expression_totals_for_each_column_group`):
  * a declarative spec of expressions (one per report cell template) is
  * batched by engine, evaluated once per column group (comparison period),
  * and the `aggregation` engine resolves last as a driver-side fixpoint
  * over the collected totals.
  *
  * Spark-first orchestration choices (SURVEY §4.1 "formula batching"):
  * - ALL domain expressions × ALL column groups evaluate in ONE scan —
  *   each (group, expression) is a `sum(when(scope ∧ domain, measure))`
  *   aggregate column of a single job (the reference issues one SQL query
  *   per engine batch per group).
  * - account_codes formulas share ONE per-code aggregation scan (again all
  *   groups at once); the tiny per-code totals are then prefix-matched and
  *   gated driver-side, like the reference's post-processing.
  * - external values aggregate per group from the external-values table.
  * - aggregation formulas never touch row data: [[AggregationEvaluator]]
  *   fixpoint over the other engines' totals.
  *
  * At 100 TB: exactly two fact scans per report (domain batch + codes
  * batch) regardless of expression or period count; driver state is one
  * Double per (expression, group). */
object ReportRunner {

  sealed trait Engine
  /** Sum `measure` over rows matching the domain (P1) within the scope.
    * `mode` is the reference's domain-engine subformula
    * (account_report.py:2604-2710): "sum" (default), "sum_if_pos" /
    * "sum_if_neg" (keep the sum only when the UN-negated total's sign
    * matches, at currency precision, with >= 0 counting as positive —
    * :2692 "0 is considered positive"), or "count_rows" (row count).
    * `negate` is the '-' subformula prefix, applied AFTER the sign
    * gate. */
  final case class DomainSum(domain: Seq[Any], negate: Boolean = false,
                             mode: String = "sum") extends Engine
  /** account_codes DSL over per-code balances (§2.5). */
  final case class CodesFormula(formula: String) extends Engine
  /** external-values engine, `sum` or `most_recent` mode (§2.5). */
  final case class External(exprId: String, mostRecent: Boolean = false) extends Engine
  /** arithmetic over other expressions' codes, fixpoint-resolved (§2.5).
    * `crossScope` marks a cross_report formula (account_report.py:
    * 2279-2419): its terms resolve against `Ctx.crossExprs` — ANOTHER
    * report's expressions — re-evaluated under this forced date scope
    * (the reference's forced_date_scope), shadowing same-named local
    * codes. */
  final case class Aggregation(formula: String,
                               bounds: Seq[AggregationEvaluator.Bound] = Nil,
                               crossScope: Option[DateScope.Scope] = None) extends Engine

  final case class Expr(code: String, engine: Engine,
                        scope: DateScope.Scope = DateScope.StrictRange)
  /** `forced` is the column group's forced_domain (reference
    * `_get_column_group_options`, account_report.py:2162-2169): the
    * horizontal-group membership predicates from [[ReportSpec]], AND-ed
    * into every fact predicate of this group. */
  final case class ColumnGroup(key: String, from: LocalDate, to: LocalDate,
                               forced: Seq[Any] = Nil)

  /** `crossExprs`: the OTHER report's expression set for cross_report
    * aggregations — domain leaves ride the batch-1 scan, account_codes
    * leaves the batch-2 scan, and the other report's own aggregation
    * formulas resolve over those leaves per forced scope (the reference
    * expands the referenced expressions with `_expand_aggregations`, so a
    * cross term may name any engine's expression,
    * test_report_engines.py:865-960). */
  final case class Ctx(journal: DataFrame, dateCol: Column, codeCol: Column,
                       measure: Column, external: Option[DataFrame] = None,
                       fc: DateScope.FiscalConfig = DateScope.FiscalConfig(),
                       crossExprs: Seq[Expr] = Nil)

  /** Evaluate every expression under every column group.
    * Returns group key -> expression code -> value. */
  def run(ctx: Ctx, exprs: Seq[Expr], groups: Seq[ColumnGroup]): Map[String, Map[String, Double]] = {
    val domainExprs = exprs.collect { case e @ Expr(_, _: DomainSum, _) => e }
    val codesExprs = exprs.collect { case e @ Expr(_, _: CodesFormula, _) => e }
    val extExprs = exprs.collect { case e @ Expr(_, _: External, _) => e }
    val aggExprs = exprs.collect { case e @ Expr(_, _: Aggregation, _) => e }

    // ---- batch 1: every (domain expr × group) in ONE scan --------------
    // Cross-report leaves ride in the SAME scan: for each forced scope a
    // cross_report aggregation actually uses, the other report's domain
    // expressions become extra aggregation buffers evaluated under that
    // scope (reference: other_cross_report_expr_totals_by_scope).
    val crossScopes: Seq[DateScope.Scope] = aggExprs
      .map(_.engine.asInstanceOf[Aggregation]).flatMap(_.crossScope).distinct
    val crossDomainExprs = ctx.crossExprs.collect { case e @ Expr(_, _: DomainSum, _) => e }
    val crossCodesExprs = ctx.crossExprs.collect { case e @ Expr(_, _: CodesFormula, _) => e }
    val crossAggExprs = ctx.crossExprs.collect { case e @ Expr(_, _: Aggregation, _) => e }

    // currency-precision sign compare (reference compare_amounts; the
    // sum_if_pos/neg gates round to the currency's 2 decimals first)
    def cmp0(v: Double): Int =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).signum

    def domainCol(e: Expr, g: ColumnGroup, scope: DateScope.Scope, name: String): Column = {
      val ds = e.engine.asInstanceOf[DomainSum]
      val m = if (ds.mode == "count_rows") lit(1.0) else ctx.measure
      coalesce(sum(when(
        DateScope.predicate(scope, ctx.dateCol, g.from, g.to, ctx.fc) &&
          Domain.compile(g.forced) && Domain.compile(ds.domain),
        m).otherwise(lit(0.0))), lit(0.0)).as(name)
    }

    // the sign gate reads the UN-negated total, then '-' applies
    // (reference strips the '-' prefix before classifying the policy,
    // account_report.py:2683-2688)
    def domainFinish(e: Expr, raw: Double): Double = {
      val ds = e.engine.asInstanceOf[DomainSum]
      val gated = ds.mode match {
        case "sum_if_pos" => if (cmp0(raw) >= 0) raw else 0.0
        case "sum_if_neg" => if (cmp0(raw) < 0) raw else 0.0
        case _ => raw
      }
      if (ds.negate) -gated else gated
    }

    val ownCols = for (g <- groups; e <- domainExprs)
      yield domainCol(e, g, e.scope, s"${g.key}||${e.code}")
    val crossCols = for (g <- groups; sc <- crossScopes; e <- crossDomainExprs)
      yield domainCol(e, g, sc, s"${g.key}||cross|$sc||${e.code}")

    val batch1 = ownCols ++ crossCols
    val batch1Row = if (batch1.isEmpty) null
      else ctx.journal.agg(batch1.head, batch1.tail: _*).head()

    val domainTotals: Map[(String, String), Double] =
      (for (g <- groups; e <- domainExprs) yield (g.key, e.code) ->
        domainFinish(e, batch1Row.getDouble(batch1Row.fieldIndex(s"${g.key}||${e.code}")))).toMap

    // ---- batch 2: per-code balances for all codes formulas, ONE scan ---
    // Cross-report account_codes leaves share the scan: their forced
    // scopes just add buffer columns.
    val codesScopes = (codesExprs.map(_.scope) ++
      (if (crossCodesExprs.nonEmpty) crossScopes else Nil)).distinct
    val perCodeBalances: Map[(String, DateScope.Scope), Seq[(String, Double)]] =
      if (codesScopes.isEmpty) Map.empty
      else {
        val cols = for (g <- groups; sc <- codesScopes) yield
          sum(when(DateScope.predicate(sc, ctx.dateCol, g.from, g.to, ctx.fc) &&
              Domain.compile(g.forced),
            ctx.measure).otherwise(lit(0.0))).as(s"${g.key}||$sc")
        val perCode = ctx.journal.groupBy(ctx.codeCol.cast("string").as("code"))
          .agg(cols.head, cols.tail: _*)
          .collect() // bounded by the chart of accounts, not the fact table
        (for (g <- groups; sc <- codesScopes) yield (g.key, sc) ->
          perCode.toSeq.map(r =>
            r.getString(0) -> r.getDouble(r.fieldIndex(s"${g.key}||$sc")))).toMap
      }
    val codesTotals: Map[(String, String), Double] =
      (for (g <- groups; e <- codesExprs) yield (g.key, e.code) ->
        evalCodes(e.engine.asInstanceOf[CodesFormula].formula,
          perCodeBalances((g.key, e.scope)))).toMap

    // (group key, forced scope) -> other-report code -> value: domain +
    // codes leaves, then the other report's own aggregation formulas
    // resolved over them under that scope
    val crossTotals: Map[(String, DateScope.Scope), Map[String, Double]] =
      (for (g <- groups; sc <- crossScopes) yield {
        val leaves =
          crossDomainExprs.map(e => e.code -> domainFinish(e,
            batch1Row.getDouble(batch1Row.fieldIndex(s"${g.key}||cross|$sc||${e.code}")))).toMap ++
          crossCodesExprs.map(e => e.code ->
            evalCodes(e.engine.asInstanceOf[CodesFormula].formula,
              perCodeBalances((g.key, sc)))).toMap
        val aggs = crossAggExprs.map { e =>
          val a = e.engine.asInstanceOf[Aggregation]
          e.code -> AggregationEvaluator.Expr(a.formula, a.bounds)
        }.toMap
        (g.key, sc) -> (leaves ++ AggregationEvaluator.evaluate(aggs, leaves))
      }).toMap

    // ---- batch 3: every (external expr × group) in ONE scan ------------
    // The value table first collapses to one row per (expression, date):
    // the reference's most_recent is the SUM of all values at the latest
    // date in the window (account_report.py:2907-2912 `GROUP BY date ORDER
    // BY date DESC LIMIT 1` around SUM(value)) — a tax unit writes several
    // same-dated carryover values per company and they must net. Sum mode
    // is unchanged by the pre-aggregation. Each expression's date window
    // honors its date scope (account_report.py:2883 feeds the expression's
    // date_scope through `_get_date_bounds_info` — e.g. the
    // `_applied_carryover_balance` expressions read `previous_tax_period`).
    // Everything is still aggregation buffers of ONE job over the (tiny)
    // external-values table.
    val extTotals: Map[(String, String), Double] =
      if (extExprs.isEmpty) Map.empty
      else {
        val ext = ctx.external.getOrElse(
          throw new IllegalStateException("external exprs need ctx.external"))
        val extByDate = ext.groupBy(col("expression_id"), col("date"))
          .agg(sum(col("value")).as("value"))
        val cols = for (g <- groups; e <- extExprs) yield {
          val eng = e.engine.asInstanceOf[External]
          val (fOpt, t) = DateScope.bounds(e.scope, g.from, g.to, ctx.fc)
          val inRange = col("date") <= lit(t.toString) &&
            fOpt.map(f => col("date") >= lit(f.toString)).getOrElse(lit(true)) &&
            col("expression_id") === lit(eng.exprId)
          val agg =
            if (eng.mostRecent) max_by(when(inRange, col("value")), when(inRange, col("date")))
            else sum(when(inRange, col("value")))
          coalesce(agg, lit(0.0)).as(s"${g.key}||${e.code}")
        }
        val row = extByDate.agg(cols.head, cols.tail: _*).head()
        (for ((g, i) <- groups.zipWithIndex; (e, j) <- extExprs.zipWithIndex)
          yield (g.key, e.code) -> row.getDouble(i * extExprs.size + j)).toMap
      }

    // ---- batch 4: aggregation fixpoint per group (resolved LAST) -------
    groups.map { g =>
      val leaves = (domainTotals ++ codesTotals ++ extTotals).collect {
        case ((gk, code), v) if gk == g.key => code -> v
      }
      val aggs = aggExprs.map { e =>
        val a = e.engine.asInstanceOf[Aggregation]
        val crossLeaves = a.crossScope
          .map(sc => crossTotals((g.key, sc))).getOrElse(Map.empty)
        e.code -> AggregationEvaluator.Expr(a.formula, a.bounds, crossLeaves)
      }.toMap
      val resolved = AggregationEvaluator.evaluate(aggs, leaves)
      g.key -> (leaves ++ resolved)
    }.toMap
  }

  /** Driver-side account_codes evaluation over collected (code, balance)
    * pairs — prefix match, exclusions, D/C gate, term sign (mirrors
    * [[AccountCodes.evaluate]] for the orchestrated path). */
  private def evalCodes(formula: String, balances: Seq[(String, Double)]): Double =
    AccountCodes.parse(formula).map { t =>
      balances.collect {
        case (code, bal)
          if code.startsWith(t.prefix) &&
            !t.excluded.exists(code.startsWith) &&
            (t.balanceChar match {
              case Some('D') => bal >= 0
              case Some('C') => bal < 0
              case _ => true
            }) => bal * t.sign
      }.sum
    }.sum

  /** Render totals as a [[graft.report.LineTree.Line]] matrix (one value
    * per column group, in `groups` order) for tree post-processing. */
  def toLines(totals: Map[String, Map[String, Double]], exprs: Seq[Expr],
              groups: Seq[ColumnGroup]): Seq[graft.report.LineTree.Line] =
    exprs.map { e =>
      graft.report.LineTree.Line(e.code, None, e.code,
        groups.map(g => totals(g.key).getOrElse(e.code, 0.0)))
    }
}
