package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 data-SELECTION operators: the steps that decide WHICH documents
  * (or vectors) enter a training corpus, as opposed to the cleaning steps
  * in [[CurationOps]] — distribution-matched selection (DSIR shape),
  * membership screening against a frozen corpus (Bloom shape), semantic
  * dedup over embedding cells (SemDeDup shape), and diversity coresets
  * (greedy k-center). Each gated bit-exact against DuckDB.
  *
  * Scale posture: feature/side tables are bounded by a FIXED bucket or
  * bit-array size chosen up front (1024 feature buckets, 32768 bloom
  * bits, k centroids) so they broadcast no matter how large the corpus
  * is; the per-document work is map/explode + key-partitioned aggregation;
  * the only windows are partitioned by the (lang, source) packing shard. */
object SelectionOps {

  /** Hashed-feature buckets for [[q143]] — fixed so the weight table is a
    * broadcastable dim regardless of corpus size. */
  val FeatureBuckets = 1024L

  /** Top-k kept per (lang, source) shard in [[q143]]'s selection step. */
  val SelectPerShard = 3L

  /** q143 — importance-weighted data selection (the DSIR shape: "Data
    * Selection for Language Models via Importance Resampling", Xie et al.
    * 2023): score every document by how much more likely its hashed-bigram
    * features are under a TARGET distribution (here: the `en` slice) than
    * under the full SOURCE corpus, then keep the top-k per shard.
    *
    * Transcendental-free surrogate (the [[Parity]] rule that also shaped
    * q105's perplexity stand-in): instead of summing log-probability
    * ratios, each bucket carries the fixed-point likelihood ratio
    * `w(b) = (10^6 · (ct+1)) div (cs+1)` (add-one smoothing, BIGINT
    * division — exact in both engines) and a document scores
    * `Σ_b n_b · w(b)`. Monotone in the same direction as DSIR's
    * log-ratio for the dominant buckets and bit-identical across engines,
    * which a float log-sum is not.
    *
    * Scale: bigrams explode map-side from one projected split; per-doc
    * features are one (doc_id, bucket)-keyed aggregation; the
    * source/target marginals collapse to ≤ [[FeatureBuckets]] rows each —
    * a broadcast dim. Selection ranks inside the (lang, source) shard
    * (the same bounded shard q101/q120 use), never globally. */
  def q143(s: SparkSession, d: String): DataFrame = {
    val B = FeatureBuckets
    // project the split FIRST — a split() referenced inside the zip_with
    // lambda would re-evaluate per element (no CSE across HOF boundaries)
    val ws = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("ws"))
    val nf = ws
      .select(col("doc_id"), col("lang"), col("source"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
      .select(col("doc_id"), col("lang"), col("source"),
        pmod(Parity.strHash(col("bg")), lit(B)).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val cs = nf.groupBy(col("b")).agg(sum(col("c")).as("cs"))
    val ct = nf.filter(col("lang") === "en")
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val wt = cs.join(ct, Seq("b"), "left")
      .select(col("b"),
        expr("(1000000 * (coalesce(ct, 0) + 1)) div (cs + 1)").as("w"))
    val sc = nf.join(broadcast(wt), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(sum(col("c")).as("n_bigrams"), sum(col("c") * col("w")).as("score"))
    sc.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_bigrams"), col("score"),
        when(col("rk") <= SelectPerShard, 1L).otherwise(0L).as("selected"))
      .orderBy(col("doc_id"))
  }

  val q143Sql: String = {
    val B = FeatureBuckets
    s"""WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') ws
       |           FROM documents),
       |bg AS (SELECT doc_id, lang, source, ws[i] || ' ' || ws[i+1] bg
       |       FROM (SELECT doc_id, lang, source, ws,
       |               unnest(range(1, len(ws))) i FROM w)),
       |nf AS (SELECT doc_id, lang, source,
       |         ${Parity.strHashSql("bg")} % $B b, count(*) c
       |       FROM bg GROUP BY 1, 2, 3, 4),
       |cs AS (SELECT b, CAST(sum(c) AS BIGINT) cs FROM nf GROUP BY b),
       |ct AS (SELECT b, CAST(sum(c) AS BIGINT) ct FROM nf
       |       WHERE lang = 'en' GROUP BY b),
       |wt AS (SELECT cs.b, (1000000 * (COALESCE(ct, 0) + 1)) // (cs + 1) w
       |       FROM cs LEFT JOIN ct USING (b)),
       |sc AS (SELECT doc_id, lang, source, CAST(sum(c) AS BIGINT) n_bigrams,
       |         CAST(sum(c * w) AS BIGINT) score
       |       FROM nf JOIN wt USING (b) GROUP BY 1, 2, 3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY lang, source
       |        ORDER BY score DESC, doc_id) rk FROM sc)
       |SELECT doc_id, lang, source, n_bigrams, score,
       |  CAST(CASE WHEN rk <= $SelectPerShard THEN 1 ELSE 0 END AS BIGINT)
       |    selected
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Bloom bit-array size (bits) and hash count for [[q144]]. 2^18 bits =
    * 32 KiB as 4096 longs — ~10 bits/key for the sf0.1 block population; a
    * production corpus screen scales m with the corpus epoch (still
    * broadcast-friendly: 10^10 keys at 10 bits/key is ~12 GiB, sharded as
    * partitioned blooms per corpus range). */
  val BloomBits = 262144L
  val BloomHashes = 3

  /** q144 — Bloom-filter corpus-membership screen (the incremental-ingest
    * fast path): compress the frozen corpus's paragraph-block hash set
    * (the [[CurationOps.q119]] block convention — the fixture has no
    * whole-text exact dups, but blocks DO recur across the split) into an
    * m-bit Bloom bitmap, BROADCAST the bitmap, and screen each new-batch
    * document's blocks map-side — the 100 TB alternative to q108's
    * semi-join when the corpus is orders of magnitude larger than the
    * batch. One-sided error by construction: every exact block hit is a
    * bloom hit (`n_bloom_hit >= n_exact_hit`, no false negatives), which
    * [[graft.SelectionOpsSpec]] pins on the fixture.
    *
    * Double hashing (Kirsch–Mitzenmacher): position_j = (h1 + j·h2) mod m
    * from the single portable block hash — integer-only, so the oracle
    * replays the identical bit positions. The Spark side REALLY builds the
    * bitmap (driver fold bounded by m/64 = 4096 longs — a bounded collect
    * like ReportRunner's chart-of-accounts, not fact-scale) and probes it
    * as a broadcast array literal; the oracle models the same bits as a
    * distinct-position set. */
  def q144(s: SparkSession, d: String): DataFrame = {
    val m = BloomBits
    val B = CurationOps.BlockWords
    // one scan builds every block row; two consumers (corpus fold + probe)
    val blocks = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("__w"))
      .select(col("doc_id"), size(col("__w")).cast("long").as("nw"), col("__w"))
      .select(col("doc_id"), col("__w"),
        explode(sequence(lit(0L), floor((col("nw") - 1) / B).cast("long"))).as("k"))
      .select(col("doc_id"),
        concat_ws(" ",
          slice(col("__w"), (col("k") * B + 1).cast("int"), lit(B.toInt))).as("bs"))
      .select(col("doc_id"), md5(col("bs")).as("mh"),
        Parity.strHash(col("bs")).as("h"))
      .withColumn("h1", col("h") % m)
      .withColumn("h2", lit(1L) + col("h") % (m - 1))
      .cache()
    val positions = (0 until BloomHashes).map(j =>
      (col("h1") + lit(j.toLong) * col("h2")) % m)
    // corpus side: distinct bit positions, bounded by m — fold into the
    // actual bitmap on the driver (≤ m/64 longs) and broadcast as a literal
    val corpusPos = blocks.filter(col("doc_id") % 2 === 0)
      .select(explode(array(positions: _*)).as("p")).distinct()
      .collect().map(_.getLong(0))
    val bitmap = new Array[Long]((m / 64).toInt)
    corpusPos.foreach(p => bitmap((p / 64).toInt) |= (1L << (p % 64)))
    val bm = typedlit(bitmap.toSeq)
    def bitSet(p: Column): Column =
      // & 1, not % 2: shiftright is ARITHMETIC, so a set sign bit makes
      // the shifted word negative and (x >> b) % 2 = -1 for set bits
      call_function("shiftright",
        element_at(bm, (p / 64).cast("int") + 1), (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1
    val corpusMd5 = blocks.filter(col("doc_id") % 2 === 0)
      .select(col("mh").as("cmh")).distinct()
    blocks.filter(col("doc_id") % 2 === 1)
      .join(corpusMd5.withColumn("__e", lit(1L)),
        col("mh") === col("cmh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(positions.map(bitSet).reduce(_ && _), 1L).otherwise(0L))
          .as("n_bloom_hit"),
        sum(coalesce(col("__e"), lit(0L))).as("n_exact_hit"))
      .orderBy(col("doc_id"))
  }

  val q144Sql: String = {
    val m = BloomBits
    val B = CurationOps.BlockWords
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       |b0 AS (SELECT doc_id,
       |         array_to_string(ws[k*$B+1 : (k+1)*$B], ' ') bs
       |       FROM (SELECT doc_id, ws,
       |               unnest(range(0, (len(ws)-1) // $B + 1)) k FROM w)),
       |h AS (SELECT doc_id, md5(bs) mh, ${Parity.strHashSql("bs")} h FROM b0),
       |hh AS (SELECT doc_id, mh, h % $m h1, 1 + (h % ${m - 1}) h2 FROM h),
       |cpos AS (SELECT DISTINCT (h1 + j * h2) % $m p
       |         FROM hh, generate_series(0, ${BloomHashes - 1}) t(j)
       |         WHERE doc_id % 2 = 0),
       |cmd5 AS (SELECT DISTINCT mh FROM hh WHERE doc_id % 2 = 0),
       |hr AS (SELECT *, row_number() OVER () rid FROM hh WHERE doc_id % 2 = 1),
       |probe AS (SELECT doc_id, mh,
       |            CAST(sum(CASE WHEN p IN (SELECT p FROM cpos)
       |              THEN 1 ELSE 0 END) AS BIGINT) nhit
       |          FROM (SELECT doc_id, mh, rid, (h1 + j * h2) % $m p
       |                FROM hr, generate_series(0, ${BloomHashes - 1}) t(j))
       |          GROUP BY doc_id, mh, rid)
       |SELECT doc_id, count(*)::BIGINT n_blocks,
       |  CAST(sum(CASE WHEN nhit = $BloomHashes THEN 1 ELSE 0 END) AS BIGINT)
       |    n_bloom_hit,
       |  CAST(sum(CASE WHEN mh IN (SELECT mh FROM cmd5) THEN 1 ELSE 0 END)
       |    AS BIGINT) n_exact_hit
       |FROM probe GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_dsir_weights" -> (q143 _), "q144_bloom_screen" -> (q144 _))

  val oracle: Map[String, String] = Map(
    "q143_dsir_weights" -> q143Sql, "q144_bloom_screen" -> q144Sql)
}
