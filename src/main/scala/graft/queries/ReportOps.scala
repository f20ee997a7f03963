package graft.queries

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.report.Handlers

/** Gate queries for the composed report handlers (graft.report.Handlers):
  * general ledger with unaffected-earnings collapse (q47) and the aged-
  * balance bucket pivot (q48). The journal shape is mapped from `orders`
  * (account := o_custkey % 100, amount := o_totalprice). */
object ReportOps {

  /** q47 — GeneralLedger handler: prior-FY rows collapse into synthetic
    * account -1, then initial/period/closing balances per account in one
    * scan (A14/A17/A18 through the real handler). */
  def q47(s: SparkSession, d: String): DataFrame = {
    val journal = Tables.orders(s, d)
      .withColumn("account", col("o_custkey") % 100)
    val collapsed = Handlers.GeneralLedger.collapsePriorYears(
      journal, col("o_orderdate"), col("account"),
      LocalDate.of(1995, 1, 1), unaffectedKey = -1L)
    Handlers.GeneralLedger.accountSummary(collapsed,
        col("o_orderdate"), Seq(col("account_collapsed").as("acct")),
        col("o_totalprice"),
        LocalDate.of(1996, 1, 1), LocalDate.of(1996, 12, 31))
      .select(col("acct"),
        round(col("initial_bal"), 2).as("initial_bal"),
        round(col("period_bal"), 2).as("period_bal"),
        round(col("closing_bal"), 2).as("closing_bal"))
      .orderBy(col("acct"))
  }

  val q47Sql: String =
    """WITH j AS (
      |  SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
      |              THEN -1 ELSE o_custkey % 100 END AS acct,
      |         o_orderdate d, o_totalprice v
      |  FROM orders)
      |SELECT acct,
      |  round(sum(CASE WHEN d < TIMESTAMP '1996-01-01 00:00:00' THEN v ELSE 0 END), 2) AS initial_bal,
      |  round(sum(CASE WHEN d >= TIMESTAMP '1996-01-01 00:00:00'
      |                  AND d <= TIMESTAMP '1996-12-31 00:00:00' THEN v ELSE 0 END), 2) AS period_bal,
      |  round(sum(CASE WHEN d < TIMESTAMP '1996-01-01 00:00:00' THEN v ELSE 0 END)
      |      + sum(CASE WHEN d >= TIMESTAMP '1996-01-01 00:00:00'
      |                  AND d <= TIMESTAMP '1996-12-31 00:00:00' THEN v ELSE 0 END), 2) AS closing_bal
      |FROM j
      |WHERE d < TIMESTAMP '1996-01-01 00:00:00'
      |   OR (d >= TIMESTAMP '1996-01-01 00:00:00' AND d <= TIMESTAMP '1996-12-31 00:00:00')
      |GROUP BY acct ORDER BY acct""".stripMargin

  /** q48 — AgedBalance handler: bucket chain + pivot with configurable
    * bounds (J6/A4/W6 through the handler). */
  def q48(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val asOf = lit("2000-01-01").cast("timestamp")
    val bounds = Seq(180, 365, 730)
    val bucket = Handlers.AgedBalance.bucketCol(asOf, col("o_orderdate"), bounds)
    Handlers.AgedBalance.pivotBuckets(
        o.withColumn("bucket", bucket),
        Seq(col("o_orderpriority")), col("bucket"), col("o_totalprice"), bounds)
      .orderBy(col("o_orderpriority"))
  }

  val q48Sql: String =
    """WITH aged AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    CASE WHEN datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') <= 180 THEN 'b0_le_180'
      |         WHEN datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') <= 365 THEN 'b1_le_365'
      |         WHEN datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') <= 730 THEN 'b2_le_730'
      |         ELSE 'b3_gt_730' END AS bucket
      |  FROM orders)
      |SELECT o_orderpriority,
      |  round(sum(CASE WHEN bucket = 'b0_le_180' THEN o_totalprice ELSE 0 END), 2) AS b0_le_180,
      |  round(sum(CASE WHEN bucket = 'b1_le_365' THEN o_totalprice ELSE 0 END), 2) AS b1_le_365,
      |  round(sum(CASE WHEN bucket = 'b2_le_730' THEN o_totalprice ELSE 0 END), 2) AS b2_le_730,
      |  round(sum(CASE WHEN bucket = 'b3_gt_730' THEN o_totalprice ELSE 0 END), 2) AS b3_gt_730
      |FROM aged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q50 — Ledger handler: per-customer running balance over 1996 orders,
    * seeded with the pre-1996 balance (W1/W2 with the initial-balance seam
    * the reference threads as `progress`). */
  def q50(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    Handlers.Ledger.runningDetail(o, col("o_orderdate"), col("o_custkey"),
        col("o_orderkey"), col("o_totalprice"),
        LocalDate.of(1996, 1, 1), LocalDate.of(1996, 12, 31))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        round(col("running_bal"), 2).as("running_bal"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  val q50Sql: String =
    """WITH init AS (
      |  SELECT o_custkey k, sum(o_totalprice) init_bal FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1),
      |period AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |    sum(o_totalprice) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00')
      |SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  round(coalesce(init_bal, 0) + cum, 2) AS running_bal
      |FROM period LEFT JOIN init ON o_custkey = k
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  /** q51 — drill-down groupby chain (SURVEY §3.2 / A15): the reference
    * expands region→nation→customer level by level with parent filters
    * pushed down; here ONE rollup pass with GROUPING() level markers
    * produces every level of the chain at once. */
  def q51(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("bal"),
        (lit(3) - grouping(col("r_name")) - grouping(col("n_name"))
          - grouping(col("c_mktsegment"))).cast("long").as("level"))
      .select(
        col("level"),
        coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
        col("n_cust"), col("bal"))
      .orderBy(col("level"), col("region"), col("nation"), col("segment"))
  }

  val q51Sql: String =
    """SELECT
      |  (3 - (CASE WHEN GROUPING(r_name) = 1 THEN 1 ELSE 0 END)
      |     - (CASE WHEN GROUPING(n_name) = 1 THEN 1 ELSE 0 END)
      |     - (CASE WHEN GROUPING(c_mktsegment) = 1 THEN 1 ELSE 0 END))::BIGINT AS level,
      |  coalesce(r_name, '(all)') AS region,
      |  coalesce(n_name, '(all)') AS nation,
      |  coalesce(c_mktsegment, '(all)') AS segment,
      |  count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
      |ORDER BY level, region, nation, segment""".stripMargin

  /** q53 — register pipeline (SURVEY §3.3): the sales-register shape via
    * graft.registers — order amounts pivoted into per-priority columns
    * (native `pivot` with an explicit value list ⇒ one scan, fixed schema)
    * with a '(total)' grand-total row. */
  def q53(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderstatus") =!= "P")
    graft.registers.Registers.pivotRegister(
      o, col("o_orderstatus"), col("o_orderpriority"),
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
      col("o_totalprice"))
  }

  val q53Sql: String =
    """WITH f AS (SELECT * FROM orders WHERE o_orderstatus <> 'P'),
      |g AS (
      |  SELECT o_orderstatus AS group_key, o_orderpriority, o_totalprice FROM f
      |  UNION ALL
      |  SELECT '(total)', o_orderpriority, o_totalprice FROM f)
      |SELECT group_key,
      |  coalesce(round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2), 0) AS "1-URGENT",
      |  coalesce(round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2), 0) AS "2-HIGH",
      |  coalesce(round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2), 0) AS "3-MEDIUM",
      |  coalesce(round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2), 0) AS "4-NOT SPECIFIED",
      |  coalesce(round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2), 0) AS "5-LOW"
      |FROM g GROUP BY group_key ORDER BY group_key""".stripMargin

  /** q54 — full ReportRunner lifecycle (SURVEY §3.1): domain, account_codes
    * and aggregation expressions batched and evaluated across two column
    * groups in two fact scans, fixpoint last. Output = the
    * (group, expression, value) totals table. */
  def q54(s: SparkSession, d: String): DataFrame = {
    import graft.engine.{DateScope, ReportRunner}
    val s0 = s; import s0.implicits._
    val journal = Tables.orders(s, d).select(
      col("o_orderdate").as("d"),
      (col("o_custkey") % 100).cast("string").as("code"),
      col("o_orderstatus").as("state"),
      col("o_totalprice").as("v"))
    val ctx = ReportRunner.Ctx(journal, col("d"), col("code"), col("v"))
    val exprs = Seq(
      ReportRunner.Expr("D1.bal", ReportRunner.DomainSum(Seq(("state", "=", "F")))),
      ReportRunner.Expr("D2.bal", ReportRunner.DomainSum(Seq(("state", "=", "F"))),
        scope = DateScope.FromBeginning),
      ReportRunner.Expr("C1.bal", ReportRunner.CodesFormula("1\\(15) + 2C")),
      ReportRunner.Expr("A1.bal", ReportRunner.Aggregation(
        "100 * D1.bal / D2.bal",
        Seq(graft.engine.AggregationEvaluator.RoundTo(2)))))
    val groups = Seq(
      ReportRunner.ColumnGroup("p1995", LocalDate.of(1995, 1, 1), LocalDate.of(1995, 12, 31)),
      ReportRunner.ColumnGroup("p1996", LocalDate.of(1996, 1, 1), LocalDate.of(1996, 12, 31)))
    val out = ReportRunner.run(ctx, exprs, groups)
    (for (g <- groups; e <- exprs) yield {
      val v = out(g.key)(e.code)
      val rounded = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g.key, e.code, rounded)
    }).toDF("group_key", "expr", "value")
      .orderBy(col("group_key"), col("expr"))
  }

  val q54Sql: String =
    """WITH j AS (
      |  SELECT o_orderdate d, CAST(o_custkey % 100 AS VARCHAR) code,
      |         o_orderstatus state, o_totalprice v FROM orders),
      |g(gk, f, t) AS (VALUES
      |  ('p1995', TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1995-12-31 00:00:00'),
      |  ('p1996', TIMESTAMP '1996-01-01 00:00:00', TIMESTAMP '1996-12-31 00:00:00')),
      |d1 AS (SELECT gk, sum(CASE WHEN d >= f AND d <= t AND state = 'F'
      |                           THEN v ELSE 0 END) val
      |       FROM j CROSS JOIN g GROUP BY gk),
      |d2 AS (SELECT gk, sum(CASE WHEN d <= t AND state = 'F'
      |                           THEN v ELSE 0 END) val
      |       FROM j CROSS JOIN g GROUP BY gk),
      |percode AS (
      |  SELECT gk, code, sum(CASE WHEN d >= f AND d <= t THEN v ELSE 0 END) bal
      |  FROM j CROSS JOIN g GROUP BY gk, code),
      |c1 AS (
      |  SELECT gk, sum(CASE
      |    WHEN code LIKE '1%' AND code NOT LIKE '15%' THEN bal
      |    WHEN code LIKE '2%' AND bal < 0 THEN bal
      |    ELSE 0 END) val
      |  FROM percode GROUP BY gk),
      |rows AS (
      |  SELECT gk, 'D1.bal' e, round(val, 2) v FROM d1
      |  UNION ALL SELECT gk, 'D2.bal', round(val, 2) FROM d2
      |  UNION ALL SELECT gk, 'C1.bal', round(val, 2) FROM c1
      |  UNION ALL
      |  SELECT d1.gk, 'A1.bal',
      |    CASE WHEN d2.val = 0 THEN 0
      |         ELSE round(round(100 * d1.val / d2.val, 2), 2) END
      |  FROM d1 JOIN d2 ON d1.gk = d2.gk)
      |SELECT gk AS group_key, e AS expr, v AS value
      |FROM rows ORDER BY group_key, expr""".stripMargin

  /** q55 — multicurrency revaluation handler: pseudo-currency = custkey%5,
    * historic amount_currency = price*(1+cur/10), as-of rates from a
    * literal dim, provision accounts (custkey%97=0) anti-joined out
    * (J10 + J8 through the handler). */
  def q55(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val facts = o.select(
      col("o_custkey"),
      (col("o_custkey") % 5).cast("long").as("cur_key"),
      col("o_totalprice").as("bal"),
      Parity.fr(col("o_totalprice") * (lit(1.0) + (col("o_custkey") % 5) / lit(10.0)), 2).as("amt_cur"))
    val excluded = o.select(col("o_custkey")).distinct()
      .filter(col("o_custkey") % 97 === 0)
    Handlers.MulticurrencyReval.compute(facts, col("cur_key"), col("bal"),
        col("amt_cur"), Seq((0L, 1.05), (1L, 1.10), (2L, 0.95), (3L, 1.20), (4L, 1.00)),
        excluded, "o_custkey")
      .orderBy(col("currency"))
  }

  val q55Sql: String =
    """WITH facts AS (
      |  SELECT o_custkey, o_custkey % 5 AS cur_key, o_totalprice AS bal,
      |    floor(o_totalprice * (1.0 + (o_custkey % 5) / 10.0) * 100 + 0.5) / 100 AS amt_cur
      |  FROM orders WHERE o_custkey % 97 <> 0),
      |rates(cur, rate) AS (VALUES (0, 1.05), (1, 1.10), (2, 0.95), (3, 1.20), (4, 1.00))
      |SELECT cur_key AS currency,
      |  round(sum(bal), 2) AS balance,
      |  round(sum(amt_cur), 2) AS amount_currency,
      |  round(sum(amt_cur / rate) - sum(bal), 2) AS adjustment
      |FROM facts JOIN rates ON cur_key = cur
      |GROUP BY cur_key ORDER BY currency""".stripMargin

  /** q56 — cash-flow handler: three differently-sourced movement sets
    * (operating = order totals, investing = discounted line amounts,
    * financing = event values) unioned with category tags, per-category
    * sums plus the rollup grand total (§2.8 through the handler). */
  def q56(s: SparkSession, d: String): DataFrame = {
    val operating = Tables.orders(s, d).select(col("o_totalprice").as("amount"))
    val investing = Tables.lineitem(s, d)
      .select((col("l_extendedprice") * (lit(1) - col("l_discount"))).as("amount"))
    val financing = Tables.events(s, d).select(col("value").as("amount"))
    Handlers.CashFlow.compute(Seq(
        "1_operating" -> operating, "2_investing" -> investing,
        "3_financing" -> financing))
      .orderBy(col("category"))
  }

  val q56Sql: String =
    """WITH u AS (
      |  SELECT '1_operating' AS category, o_totalprice AS amount FROM orders
      |  UNION ALL
      |  SELECT '2_investing', l_extendedprice * (1 - l_discount) FROM lineitem
      |  UNION ALL
      |  SELECT '3_financing', value FROM events)
      |SELECT coalesce(category, '(total)') AS category,
      |  count(*) AS n, round(sum(amount), 2) AS total
      |FROM u GROUP BY ROLLUP (category) ORDER BY category""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_general_ledger" -> (q47 _), "q48_aged_handler" -> (q48 _),
    "q50_running_ledger" -> (q50 _), "q51_groupby_chain" -> (q51 _),
    "q53_pivot_register" -> (q53 _), "q54_report_runner" -> (q54 _),
    "q55_multicurrency_reval" -> (q55 _), "q56_cash_flow" -> (q56 _))

  val oracle: Map[String, String] = Map(
    "q47_general_ledger" -> q47Sql, "q48_aged_handler" -> q48Sql,
    "q50_running_ledger" -> q50Sql, "q51_groupby_chain" -> q51Sql,
    "q53_pivot_register" -> q53Sql, "q54_report_runner" -> q54Sql,
    "q55_multicurrency_reval" -> q55Sql, "q56_cash_flow" -> q56Sql)
}
