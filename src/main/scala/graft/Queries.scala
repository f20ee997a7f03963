package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational gate queries: one per SURVEY.md §2 operator, expressed over the
  * driver testdata star schema, each with a matching DuckDB oracle in
  * [[Queries.oracle]].
  *
  * Conventions (driver compare contract):
  *   - every aggregate/computed column aliased identically in Spark + SQL;
  *   - doubles rounded (2dp for money-like sums, 4dp for ratios) on BOTH sides
  *     so float summation order can't flip the hash;
  *   - deterministic full ORDER BY on both sides;
  *   - year()/datediff() results cast to BIGINT on both sides (Spark INT vs
  *     DuckDB BIGINT would hash-mismatch).
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def r2(c: Column): Column = round(c, 2)

  /** A1/S1: grouped sums of derived measures (general-ledger account sums
    * shape, account_general_ledger.py:242-256 — filter, groupBy, many aggs,
    * count, max(date)). TPC-H Q1 flavored. */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order,
      |  strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def all: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
