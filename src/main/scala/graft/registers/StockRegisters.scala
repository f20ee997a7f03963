package graft.registers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stock wizard registers (reference etl_stock/wizard/serial_report.py:47-
  * 120 and reconcile_report.py:38-135) — the composed register shapes on
  * top of the serial in-out ledger core (gated separately, q16/q78-q80).
  *
  * Both reference wizards are nested ORM loops: for each location × category
  * × product they re-query the movement table and walk it in Python.
  * Spark-first each register is ONE scan of the movement ledger with the
  * dimensional filters pushed into it, one groupBy, and broadcast dim joins
  * — the loop nest becomes the grouping key.
  */
object StockRegisters {

  /** Serial-numbers register (serial_report.py:action_print): as-of `asOf`,
    * the on-hand quantity per (location, product, serial), skipping
    * serials whose rounded qty is zero (reference: `if round(qty, 3) != 0`),
    * ordered as the sheet prints: location, then product, then serial
    * (reference order='product_id,name' inside each location block).
    *
    * `moves` columns: location, product_key, serial, qty (signed), mv_date.
    * `products` dim: product_key, product_code, product_name, category —
    * pre-filtered by the wizard's category selection; the join is inner, so
    * it applies the category filter too (broadcast: dim-sized). */
  def serialRegister(moves: DataFrame, products: DataFrame,
                     asOf: Column): DataFrame = {
    // fixed-point milli-units: summing LONGs is exact and order-independent
    // (a distributed double sum is not — partial-agg order varies run to
    // run), which is also what makes the reference's round(qty, 3) gate
    // reproducible here at any partition count
    val milli = floor(col("qty") * 1000 + 0.5).cast("long")
    moves.filter(col("mv_date") <= asOf)
      .groupBy(col("location"), col("product_key"), col("serial"))
      .agg(sum(milli).as("qty_milli"))
      .filter(col("qty_milli") =!= 0L)
      .join(broadcast(products), Seq("product_key"))
      .select(col("location"), col("product_key"), col("product_code"),
        col("product_name"), col("category"), col("serial"),
        (col("qty_milli").cast("double") / 1000.0).as("qty"))
      .orderBy(col("location"), col("product_name"), col("product_key"),
        col("serial"))
  }

  /** Stock reconciliation register (reconcile_report.py:action_print): per
    * product, opening balance (movements strictly before `start`), receipts
    * and issues within [start, end] (issues reported as absolute values,
    * reconcile_report.py:110-111), closing = ob + in − out, value columns
    * summed alongside, and unit_price = balance_amount / closing (0 when
    * closing is 0). All-zero products are dropped (the reference's
    * `if ob == 0 and ... : pass`).
    *
    * `moves` columns: product_key, qty (signed), value (signed), mv_date.
    * One scan: the three date windows are conditional sums, not three
    * queries per product as in the reference. */
  def reconcileRegister(moves: DataFrame, products: DataFrame,
                        start: Column, end: Column): DataFrame = {
    def fr2(c: Column): Column = floor(c * 100 + 0.5) / 100
    // fixed-point: qty in milli-units, value in cents — LONG sums are exact
    // and order-independent, and unit_price = balance/closing is then a
    // single deterministic double division instead of a ratio of two
    // nondeterministically-ordered double sums
    val qtyM = floor(col("qty") * 1000 + 0.5).cast("long")
    val valC = floor(col("value") * 100 + 0.5).cast("long")
    val inRange = col("mv_date") >= start && col("mv_date") <= end
    // classify receipts/issues by the ROUNDED milli-qty sign, matching the
    // oracle's CASE WHEN qty_m > 0 — the raw-double sign diverges for a
    // sub-milli movement carrying a nonzero value (qty=0.0004 rounds to 0
    // yet `qty > 0` is true)
    val agg = moves.filter(col("mv_date") <= end)
      .groupBy(col("product_key"))
      .agg(
        sum(when(col("mv_date") < start, qtyM).otherwise(0L)).as("ob_m"),
        sum(when(inRange && qtyM > 0, qtyM).otherwise(0L)).as("in_m"),
        abs(sum(when(inRange && qtyM < 0, qtyM).otherwise(0L))).as("out_m"),
        sum(when(inRange && qtyM > 0, valC).otherwise(0L)).as("in_c"),
        abs(sum(when(inRange && qtyM < 0, valC).otherwise(0L))).as("out_c"),
        sum(valC).as("bal_c"))
      .withColumn("cb_m", col("ob_m") + col("in_m") - col("out_m"))
      .filter(col("ob_m") =!= 0L || col("in_m") =!= 0L ||
        col("out_m") =!= 0L || col("cb_m") =!= 0L || col("bal_c") =!= 0L)
    def q(c: Column): Column = fr2(c.cast("double") / 1000.0)
    def v(c: Column): Column = c.cast("double") / 100.0
    agg.join(broadcast(products), Seq("product_key"))
      .select(col("product_key"), col("product_code"), col("product_name"),
        col("category"),
        q(col("ob_m")).as("ob"), q(col("in_m")).as("in_qty"),
        q(col("out_m")).as("out_qty"), q(col("cb_m")).as("cb"),
        fr2(when(col("cb_m") =!= 0L,
            v(col("bal_c")) / (col("cb_m").cast("double") / 1000.0))
          .otherwise(lit(0.0))).as("unit_price"),
        v(col("in_c")).as("in_amount"),
        v(col("out_c")).as("out_amount"),
        v(col("bal_c")).as("balance_amount"))
      .orderBy(col("category"), col("product_name"), col("product_key"))
  }
}
