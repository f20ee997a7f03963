package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware join (build brief: "salting for skew, AQE for runtime
  * re-plan"): when a handful of hot keys dominate a shuffle join — e.g.
  * the no-partner reconciliation lines that the reference's partner ledger
  * re-attributes (J7) all share partner_id NULL/0 — plain hash
  * partitioning sends one key's rows to one task.
  *
  * Strategy here: explicit salting for the cases AQE's skew handling can't
  * see (first-shot joins without runtime stats, streaming). The left
  * (fact) side gets a random-but-deterministic salt in [0, n); the right
  * (smaller) side is replicated n× with every salt value; the join key
  * becomes (key, salt), splitting each hot key across n tasks. Results are
  * identical to the unsalted join. */
object SkewJoin {

  /** Left-side salt: round-robin on the row's position id, NOT a hash of
    * the row's columns — identical duplicate rows of a hot key (precisely
    * the skew case) must spread across salts, and a content hash would land
    * them all on ONE salt. No deterministic function of row CONTENT can
    * spread exact duplicates, so positional nondeterminism is inherent to
    * the operator, with two consequences callers must know:
    *
    *  - Optimizer: `monotonically_increasing_id` is flagged
    *    nondeterministic, so Catalyst will not push predicates or reorder
    *    joins THROUGH the salted projection. [[saltedInnerJoin]] bounds the
    *    barrier to the join itself (salt added immediately before, dropped
    *    immediately after), but filters on the fact side must be applied
    *    BEFORE calling — they will not migrate below the salt on their own.
    *  - Retries: a recomputed task may assign different salts than the
    *    first attempt. The join output multiset is salt-invariant (the
    *    right side carries every salt value), so results are unaffected;
    *    only per-task row placement is unstable, which can matter when
    *    diffing per-partition debug dumps across attempts. */
  def saltExpr(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Inner-join `left` and `right` on `key`, salting `left`'s hot keys.
    * `salts`: fan-out factor. Right side is replicated `salts`×, so keep it
    * the smaller input. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt", saltExpr(salts))
    val saltsDf = right.sparkSession.range(salts.toLong)
      .select(col("id").as("__salt"))
    val r = right.crossJoin(broadcast(saltsDf))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
