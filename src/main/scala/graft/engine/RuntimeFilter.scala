package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType}

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
  * The probe is Spark's own native pair (r13 ADVICE): the sketch comes
  * out of `BloomFilterAggregate` as a binary blob and the fact filters
  * through `BloomFilterMightContain` over `xxhash64(key)` — the exact
  * expressions `InjectRuntimeFilter` plants, codegen-friendly, with the
  * sketch inlined as a literal instead of a broadcast UDF closure.
  * [[bloomPruneSketch]] keeps the UDF fallback for callers holding a
  * prebuilt `BloomFilter` sketch OBJECT (no public expression surface
  * accepts one). */
object RuntimeFilter {

  /** xxhash64 hashes each INPUT TYPE differently — the same key value as
    * an int and as a long lands in different buckets, so a dim(int) /
    * fact(long) pair would silently drop MATCHING rows (false negatives,
    * the one failure mode a Bloom prune must never have). Integral keys
    * therefore widen to long on BOTH sides before hashing (the same
    * normalization `df.stat.bloomFilter` applies); any other type pair
    * must already match exactly. */
  private def hashNormalize(df: DataFrame, key: String)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.types.DataType) =
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (col(key).cast("long"), LongType)
      case other => (col(key), other)
    }

  private def hashKey(df: DataFrame, key: String): org.apache.spark.sql.Column =
    hashNormalize(df, key)._1

  private def hashedType(df: DataFrame, key: String) = hashNormalize(df, key)._2

  /** Prune `fact` rows whose `factKey` cannot match any `dim` `dimKey`
    * (integral keys of any width; other types when both sides match).
    * `expectedItems`/`fpp` size the sketch. */
  def bloomPrune(fact: DataFrame, factKey: String, dim: DataFrame,
                 dimKey: String, expectedItems: Long = 1000000L,
                 fpp: Double = 0.01): DataFrame = {
    require(hashedType(dim, dimKey) == hashedType(fact, factKey),
      s"bloomPrune key types must hash identically: dim $dimKey is " +
        s"${dim.schema(dimKey).dataType}, fact $factKey is ${fact.schema(factKey).dataType}")
    // optimal m for (n, p): -n·ln p / ln²2 (the classic Bloom sizing)
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val sketch = dim.select(Bridge.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(Bridge.expression(hashKey(dim, dimKey)))),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression())
        .as("bf"))
      .head().getAs[Array[Byte]](0)
    if (sketch == null) fact.filter(lit(false)) // empty dimension
    else fact.filter(col(factKey).isNotNull &&
      Bridge.column(BloomFilterMightContain(
        Literal(sketch, BinaryType),
        new XxHash64(Seq(Bridge.expression(hashKey(fact, factKey)))))))
  }

  /** UDF fallback for a PREBUILT sketch object (`df.stat.bloomFilter` or
    * a sketch deserialized from storage): no public native expression
    * accepts the object form, so the probe closes over a broadcast. */
  def bloomPruneSketch(fact: DataFrame, factKey: String,
                       sketch: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bc = fact.sparkSession.sparkContext.broadcast(sketch)
    val might = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey)))
  }
}
