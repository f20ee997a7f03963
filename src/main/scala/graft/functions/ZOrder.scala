package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve kernel for multi-column data layout: interleave
  * the low `bits` of two non-negative integer columns into one sort key.
  * Sorting (or range-partitioning) a table by the z-value clusters rows
  * that are close in BOTH dimensions into the same parquet row groups, so
  * min/max row-group skipping works for predicates on either column — the
  * lakehouse layout trick for two-column filter workloads, composing with
  * [[graft.sinks.PartitionedSink.writeSorted]]'s disjoint per-file ranges.
  *
  * Pure bit arithmetic on longs (shift/and/or), fully codegen-friendly and
  * computable identically in any engine — no UDF, no lookup table. */
object ZOrder {

  /** Interleaved z-value: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. Caller masks inputs to `bits` (values must be >= 0 and
    * < 2^bits; the kernel masks defensively). */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Local inverse for specs: z-value back to (x, y). */
  def zdecode(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }
}
