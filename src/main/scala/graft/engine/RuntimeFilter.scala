package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual runtime filter: build a Bloom filter over the dimension's join
  * keys and pre-filter the fact side before the shuffle — the pattern
  * Spark's own runtime row-level filtering applies when statistics allow,
  * exposed here for the cases it doesn't (e.g. a filter computed in one
  * job and applied in the next, or a dimension derived at runtime).
  *
  * At 100 TB the point is shuffle avoidance: a selective dimension prunes
  * the fact BEFORE the exchange, so the shuffle moves only rows that can
  * match. False positives only cost the join a little work — the exact
  * equi-join still runs after — and there are NO false negatives.
  *
  * The membership probe is a broadcast Bloom + UDF, not a Catalyst
  * expression: the only public mightContain surface is the sketch object
  * itself. It sits in front of an exact join, never decides results. */
object RuntimeFilter {

  /** Prune `fact` rows whose LONG `factKey` cannot match any `dim`
    * `dimKey`. `expectedItems`/`fpp` size the sketch. */
  def bloomPrune(fact: DataFrame, factKey: String, dim: DataFrame,
                 dimKey: String, expectedItems: Long = 1000000L,
                 fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey)))
  }
}
