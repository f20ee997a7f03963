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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_general_ledger" -> (q47 _), "q48_aged_handler" -> (q48 _))

  val oracle: Map[String, String] = Map(
    "q47_general_ledger" -> q47Sql, "q48_aged_handler" -> q48Sql)
}
