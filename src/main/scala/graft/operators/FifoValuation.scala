package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO valuation-layer matching (reference `etl_stock/models/svl.py:34-120`
  * `stock.valuation.layer` — `remaining_qty`/`remaining_value` per layer, and
  * Odoo's FIFO consumption of outgoing moves against the earliest incoming
  * layers; `stock_ageing.py:98-111` reports on the same layers).
  *
  * The reference mutates `remaining_qty` row by row inside the ORM. That is
  * a sequential per-record loop; at 100 TB the same semantics fall out of a
  * classic running-sum formulation that is embarrassingly parallel per key:
  *
  *   - number both sides in FIFO order and take per-key cumulative sums:
  *     an IN layer owns the half-open quantity interval [ce-q, ce) on the
  *     key's cumulative IN axis, an OUT consumes [oe-q, oe) on the OUT axis;
  *   - FIFO means the two axes are the SAME axis: OUT j consumes from layer
  *     i exactly `max(0, min(ie, oe) - max(is, os))` units — interval
  *     overlap, no iteration, no state;
  *   - a layer's remaining quantity against total consumption C is
  *     `max(0, min(q, ce - C))` — no join at all, just the per-key total.
  *
  * Scale posture: cumulative sums are window functions partitioned by the
  * product key (massively parallel; quantities cast to BIGINT so the sums
  * are exact and order-stable). The pair matching is a bucketized EQUI join
  * on (key, bucket) — same trick as [[RangeJoin]] — never a broadcast
  * nested loop. Each matched pair is emitted from the single bucket that
  * contains the overlap start, so no post-join distinct is needed.
  */
object FifoValuation {

  /** Adds `__cs`/`__ce` (half-open cumulative interval, BIGINT) per `key`
    * row in FIFO order `ord`. `qty` must be integral-valued. */
  def cumInterval(df: DataFrame, key: Column, ord: Seq[Column], qty: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__ce", sum(qty.cast("long")).over(w))
      .withColumn("__cs", col("__ce") - qty.cast("long"))
  }

  /** Per-layer remaining quantity: `ins` must carry `__cs`/`__ce` (from
    * [[cumInterval]]); `outTotals` is (key, consumed) — one row per key.
    * Joins on `key` only (consumption totals are tiny relative to layers;
    * Catalyst/AQE picks broadcast when the totals side fits). */
  def remaining(ins: DataFrame, keyCol: String, outTotals: DataFrame,
                consumedCol: String): DataFrame = {
    val c = coalesce(col(consumedCol), lit(0L))
    ins.join(outTotals, Seq(keyCol), "left")
      .withColumn("__rem",
        greatest(lit(0L), least(col("__ce") - col("__cs"), col("__ce") - c)))
      .drop(consumedCol)
  }

  /** FIFO pair allocation: every (in-layer, out) pair whose cumulative
    * intervals overlap, with `__matched` = overlapped quantity (> 0).
    * Both inputs must carry `__cs`/`__ce`; `ins`/`outs` columns are
    * otherwise disjoint (caller renames). The equi-join key is
    * (key, bucket of width `bucketWidth` on the shared cumulative axis);
    * an interval of length L lands in at most L/W + 1 buckets, and a pair
    * is emitted only from the bucket holding `max(is, os)` — exactly-once
    * without a distinct. */
  def allocate(ins: DataFrame, outs: DataFrame, keyCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Spark `/` is double division; cumulative quantities stay far below
    // 2^53 so floor-div via double is exact
    def b(c: Column): Column = floor(c / lit(bucketWidth.toDouble)).cast("long")
    def buckets(df: DataFrame) = df.withColumn("__bucket",
      // half-open [cs, ce): last occupied bucket is (ce-1)/W; empty
      // intervals (q=0) keep their single start bucket
      explode(sequence(b(col("__cs")),
        b(greatest(col("__cs"), col("__ce") - 1)))))
    val i = buckets(ins).withColumnRenamed("__cs", "__ics")
      .withColumnRenamed("__ce", "__ice")
    val o = buckets(outs).withColumnRenamed("__cs", "__ocs")
      .withColumnRenamed("__ce", "__oce")
    i.join(o, Seq(keyCol, "__bucket"))
      .withColumn("__matched",
        least(col("__ice"), col("__oce")) - greatest(col("__ics"), col("__ocs")))
      .filter(col("__matched") > 0 &&
        col("__bucket") === b(greatest(col("__ics"), col("__ocs"))))
      .drop("__bucket")
  }
}
