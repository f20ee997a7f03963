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
    * which a float log-sum is not. A document with fewer than two words
    * has no features and is absent from the output (both engines) — a
    * caller that must keep such documents left-joins the scores back.
    *
    * Scale: bigrams explode map-side from one projected split; per-doc
    * features are one (doc_id, bucket)-keyed aggregation; the
    * source/target marginals collapse to ≤ [[FeatureBuckets]] rows each —
    * a broadcast dim. Selection ranks inside the (lang, source) shard
    * (the same bounded shard q101/q120 use), never globally. */
  /** The DSIR scoring stage of [[q143]] — (doc_id, lang, source,
    * n_bigrams, score) — shared with the composed pipeline [[q150]]. */
  private[queries] def dsirScores(s: SparkSession, d: String): DataFrame = {
    val B = FeatureBuckets
    // per-doc (bucket, count) features via the native one-pass kernel
    // (r19; extends the r18 n-gram-hash step): the counts are a purely
    // row-local function of the text, so the former explode + pmod +
    // groupBy(doc_id, …, b) — one row per bigram INSTANCE and a corpus
    // exchange — comes out of the scan already aggregated. Bit-identical
    // (the kernel delegates the hash pass to PortableNgramHashExpr and
    // the hash is nonnegative, so % == pmod; KernelParitySpec pins it);
    // empty-array docs (<2 words) drop at the explode exactly as before.
    val nf = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(graft.functions.NgramBucketCounts.of(col("text"), 2, B.toInt)).as("bc"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("bc.b").as("b"), col("bc.c").as("c"))
    // both marginals in ONE pass over nf (sum + filtered sum share the
    // aggregation) — the separate cs/ct frames each recomputed the
    // explode+aggregate upstream; a null filtered sum is the missing-ct
    // case the old left join produced, so coalesce keeps the same w.
    // nf stays UNPINNED — re-adjudicated r19 (VERDICT r18 #8) with the
    // r18 n-gram kernel in place: the r11 A/B read pin 1.25 s vs
    // recompute 1.06 s warm; with the kernel the two forms TIE at both
    // granularities (Scratch8 warm rounds within ~5 %; fresh-child 3-run
    // subset benches: unpinned q143 0.74 / q150 2.21 vs pinned 0.85 /
    // 2.04 — mixed signs, inside the window band). On a tie the
    // recompute form wins on simplicity: no localCheckpoint blocks, no
    // lineage truncation, and the kernel explode is pure codegen'd
    // map-side work that only gets cheaper at scale.
    val wt = nf.groupBy(col("b"))
      .agg(sum(col("c")).as("cs"),
        sum(when(col("lang") === "en", col("c"))).as("ct"))
      .select(col("b"),
        expr("(1000000 * (coalesce(ct, 0) + 1)) div (cs + 1)").as("w"))
    nf.join(broadcast(wt), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(sum(col("c")).as("n_bigrams"), sum(col("c") * col("w")).as("score"))
  }

  def q143(s: SparkSession, d: String): DataFrame =
    dsirScores(s, d).withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_bigrams"), col("score"),
        when(col("rk") <= SelectPerShard, 1L).otherwise(0L).as("selected"))
      .orderBy(col("doc_id"))

  /** DuckDB CTE prefix computing the [[dsirScores]] frame as `sc` —
    * shared by [[q143Sql]] and [[q150Sql]]. */
  private val DsirCtes: String = {
    val B = FeatureBuckets
    s"""w AS (SELECT doc_id, lang, source, string_split(text, ' ') ws
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
       |       FROM nf JOIN wt USING (b) GROUP BY 1, 2, 3)""".stripMargin
  }

  val q143Sql: String =
    s"""WITH $DsirCtes,
       |r AS (SELECT *, row_number() OVER (PARTITION BY lang, source
       |        ORDER BY score DESC, doc_id) rk FROM sc)
       |SELECT doc_id, lang, source, n_bigrams, score,
       |  CAST(CASE WHEN rk <= $SelectPerShard THEN 1 ELSE 0 END AS BIGINT)
       |    selected
       |FROM r ORDER BY doc_id""".stripMargin

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
      // frame-scoped pin (r11 house rule): the corpus fold collects at
      // construction and the probe rides the returned plan — a cache()
      // here outlived both in the CacheManager
      .transform(graft.FramePin.pin)
    // the ONE column-side source of the double-hash bit positions, shared
    // with the q161 streaming twin (strHash is non-negative, so % and the
    // row-side floor-mod agree)
    val positions =
      graft.streaming.BloomStream.positionCols(col("h"), m, BloomHashes)
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

  /** Cosine threshold above which two same-cell vectors are semantic
    * duplicates in [[q145]]. */
  val SemTau = 0.4

  /** q145 — semantic dedup over embedding cells (the SemDeDup shape:
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", Abbas et al. 2023): cluster the embedding space with
    * the SAME deterministic k-means the IVF quantizer trains (q85), then
    * inside each cell drop every vector that has a LOWER-id neighbor with
    * cosine >= [[SemTau]] — one representative survives per near-identical
    * group, without any transitive-closure iteration. Candidate pairs are
    * additionally bounded to the q63 hyperplane bucket, so pair work is
    * (cell × bucket)-local.
    *
    * Scale: assignment is the broadcast-centroid map of the quantizer; the
    * pair join is an equi-join on (cid, bucket) — production picks k so
    * cells stay bounded (SemDeDup's own design), and the bucket cut keeps
    * each group's pair count quadratic only in a tiny group size. The
    * keep-lowest-id rule needs no iteration, unlike connected components —
    * the price is that chains A~B~C with cos(A,C) < τ keep only A (the
    * paper's ε-ball semantics, not transitive closure). */
  def q145(s: SparkSession, d: String): DataFrame = {
    val fdot = graft.functions.VectorDot.dot _
    val assign = graft.operators.KMeansQuantizer.assignTo(
      Tables.embeddings(s, d), SimilarityOps.coarseCentroids(s, d))
    // decorated vectors feed BOTH sides of the pair join and the final
    // per-cell rollup — pinned so bucket/norm compute runs once, via
    // localCheckpoint so the pin is frame-scoped (r11 house rule)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bucket", SimilarityOps.planeBucket(col("v")))
      .withColumn("n2", fdot(col("v"), col("v")))
      .join(assign.select(col("vec_id"), col("cid")), Seq("vec_id"))
      .transform(graft.FramePin.pin)
    val x = e.select(col("vec_id").as("v1"), col("v").as("va"),
      col("cid").as("cid1"), col("bucket").as("b1"), col("n2").as("na"))
    val y = e.select(col("vec_id").as("v2"), col("v").as("vb"),
      col("cid").as("cid2"), col("bucket").as("b2"), col("n2").as("nb"))
    val removed = x.join(y,
        col("cid1") === col("cid2") && col("b1") === col("b2") &&
          col("v1") < col("v2"))
      .filter(fdot(col("va"), col("vb")) / sqrt(col("na") * col("nb"))
        >= SemTau)
      .select(col("v2").as("vec_id")).distinct()
    e.join(removed.withColumn("__r", lit(1L)), Seq("vec_id"), "left")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(coalesce(col("__r"), lit(0L))).as("n_removed"))
      .withColumn("n_kept", col("n_vectors") - col("n_removed"))
      .orderBy(col("cid"))
  }

  val q145Sql: String =
    s"""WITH ${SimilarityOps.KmeansCtes},
       |bk AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN list_dot_product(
       |      list_transform(e, x -> CAST(x AS DOUBLE)),
       |      list_transform(range(64), i ->
       |        ((1103515245 * (j * 64 + i) + 12345) % 2147483648)
       |          / 2147483648.0 - 0.5)) > 0
       |    THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) bucket
       |  FROM v CROSS JOIN generate_series(0, 7) t(j) GROUP BY vec_id),
       |f AS (SELECT a3.vec_id, a3.cid, bk.bucket,
       |        list_transform(a3.e, x -> CAST(x AS DOUBLE)) vd
       |      FROM a3 JOIN bk USING (vec_id)),
       |rm AS (SELECT DISTINCT y.vec_id FROM f x JOIN f y
       |       ON x.cid = y.cid AND x.bucket = y.bucket
       |         AND x.vec_id < y.vec_id
       |       WHERE list_dot_product(x.vd, y.vd)
       |         / sqrt(list_dot_product(x.vd, x.vd)
       |              * list_dot_product(y.vd, y.vd)) >= $SemTau)
       |SELECT cid, count(*)::BIGINT n_vectors,
       |  CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM rm)
       |    THEN 1 ELSE 0 END) AS BIGINT) n_removed,
       |  count(*) - CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM rm)
       |    THEN 1 ELSE 0 END) AS BIGINT) n_kept
       |FROM f GROUP BY cid ORDER BY cid""".stripMargin

  /** Coreset size for [[q146]] — tiny by design (the selected set is
    * broadcast every round). */
  val CoresetK = 5

  /** q146 — diversity coreset by greedy k-center (farthest-point
    * traversal, the 2-approximation of Gonzalez 1985 used for
    * diversity-aware data selection): seed with the smallest vec_id, then
    * [[CoresetK]]−1 rounds of "pick the vector farthest from the selected
    * set" (ties to the smaller id). Emits each selected center with its
    * final population and coverage radius — the certificate a curator
    * reads (radius stops shrinking ⇒ k large enough).
    *
    * Scale: each round ships the ≤k selected centers to every executor —
    * as plan literals below [[LiteralCentersMaxElems]] embedded doubles,
    * as a one-row broadcast frame above it (see [[nearestCenter]]) — and
    * runs one distributed min-distance scan + TakeOrdered(1): k bounded
    * driver rows total, never a fact-scale collect; the final
    * assignment/rollup is the same broadcast-argmin map the k-means
    * quantizer uses. d² is the identical fold the q85 oracle replays, so
    * every round's argmax agrees bit-for-bit with DuckDB's. */
  /** Centers above this many embedded doubles (k·d) stop being plan
    * LITERALS and become a broadcast centers frame (VERDICT r4 "what's
    * wrong" #2: literal embedding grows the analyzed/codegen'd plan
    * O(k·d) — fine at gate scale k=5×64=320, pathological for a
    * production coreset with k in the thousands). 4096 doubles ≈ 32 KiB
    * of plan constants — comfortably inside codegen limits; beyond it the
    * broadcast path's one-time exchange is cheaper than re-analyzing a
    * megabyte plan. The quantizer/PQ paths (KMeansQuantizer.assign, q147
    * codebooks, q148/q151 LUTs) already ship as broadcast frames. */
  val LiteralCentersMaxElems = 4096

  /** The coreset distance fold (strict left-to-right IEEE, doubles) —
    * the native codegen'd kernel, bit-identical to the former
    * aggregate(zip_with(...)) form on null-free vectors (r18). */
  private def cenD2(vec: Column, cen: Column): Column =
    graft.functions.VectorD2.d2(vec, cen)

  /** Nearest-center map for a driver-held center set: every vector of `v`
    * (columns `vec_id`, `vd` array<double>) → (vec_id, vd, cid, d2) under
    * lexicographic (distance, cid) argmin — ties to the smaller id. Below
    * [[LiteralCentersMaxElems]] embedded doubles the centers inline as
    * plan literals (zero exchange, codegen'd fold); above, they collapse
    * into ONE broadcast row of (cid, cvec) structs — the
    * KMeansQuantizer.assign shape: plan size O(1), centers ship once per
    * executor, identical argmin semantics (spec-pinned equal on both
    * paths). */
  private[graft] def nearestCenter(v: DataFrame, sel: Seq[(Long, Seq[Double])],
      maxLiteralElems: Int = LiteralCentersMaxElems): DataFrame = {
    val nElems = sel.iterator.map(_._2.size).sum
    val pick = (cs: Column) => array_min(transform(cs,
      cc => struct(cenD2(col("vd"), cc.getField("cvec")).as("d"),
        cc.getField("cid").as("cid")))).as("m")
    val withM =
      if (nElems <= maxLiteralElems) {
        val cenStructs = array(sel.map { case (cid, vec) =>
          struct(lit(cid).as("cid"), typedlit(vec).as("cvec"))
        }: _*)
        v.select(col("vec_id"), col("vd"), pick(cenStructs))
      } else {
        val sp = v.sparkSession
        import sp.implicits._
        val cen = sel.toDF("cid", "cvec")
          .agg(collect_list(struct(col("cid"), col("cvec"))).as("cs"))
        v.crossJoin(broadcast(cen))
          .select(col("vec_id"), col("vd"), pick(col("cs")))
      }
    withM.select(col("vec_id"), col("vd"),
      col("m.cid").as("cid"), col("m.d").as("d2"))
  }

  def q146(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("vd"))
      .cache()
    val seed = v.orderBy(col("vec_id")).limit(1).collect()(0)
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])](
      (seed.getLong(0), seed.getSeq[Double](1)))
    for (_ <- 2 to CoresetK) {
      val far = nearestCenter(v, sel.toSeq)
        .orderBy(col("d2").desc, col("vec_id")).limit(1).collect()(0)
      sel += ((far.getLong(0), far.getSeq[Double](1)))
    }
    // the cache served the k selection rounds (all actions above); the
    // final rollup is ONE more scan — release rather than pin the vectors
    // for the session's lifetime (the KMeansQuantizer.train discipline)
    v.unpersist()
    nearestCenter(v, sel.toSeq)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"),
        Parity.fr(max(col("d2")), 6).as("radius2"))
      .orderBy(col("cid"))
  }

  val q146Sql: String = {
    val dd = "list_dot_product(" +
      "list_transform(range(64), i -> v.vd[i+1] - s.vd[i+1]), " +
      "list_transform(range(64), i -> v.vd[i+1] - s.vd[i+1]))"
    val rounds = (2 to CoresetK).map { r =>
      val prev = (1 until r).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
      s"""d$r AS (SELECT v.vec_id, v.vd, min($dd) d2
         |  FROM v CROSS JOIN ($prev) s GROUP BY v.vec_id, v.vd),
         |s$r AS (SELECT vec_id, vd FROM d$r ORDER BY d2 DESC, vec_id LIMIT 1)"""
        .stripMargin
    }.mkString(",\n")
    val all = (1 to CoresetK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH v AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) vd
       |  FROM embeddings),
       |s1 AS (SELECT vec_id, vd FROM v ORDER BY vec_id LIMIT 1),
       |$rounds,
       |cen AS ($all),
       |da AS (SELECT v.vec_id, s.vec_id cid, $dd d2
       |       FROM v CROSS JOIN cen s),
       |asg AS (SELECT vec_id, cid, d2 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d2, cid) rn FROM da) WHERE rn = 1)
       |SELECT cid, count(*)::BIGINT n_assigned,
       |  floor(max(d2) * 1e6 + 0.5) / 1e6 radius2
       |FROM asg GROUP BY cid ORDER BY cid""".stripMargin
  }

  /** PQ geometry for [[q147]]: 64 dims split into [[PqBlocks]] sub-spaces
    * of [[PqDims]] dims, each quantized to [[PqK]] centroids after
    * [[PqRounds]] Lloyd round(s) — a 64-float vector compresses to 4
    * codes of 3 bits. */
  val PqBlocks = 4
  val PqDims = 16
  val PqK = 8
  val PqRounds = 1

  /** q147 — product-quantization codebook training + encoding (the PQ of
    * Jégou et al. 2011, the storage half of IVF-PQ ANN — q52/q76 are the
    * routing half, q85 trains their coarse cells): each 16-dim sub-block
    * gets its own deterministic Lloyd codebook ([[graft.operators
    * .KMeansQuantizer]] verbatim — dimension-agnostic by construction),
    * every vector is encoded as its per-block nearest-centroid ids, and
    * the gate emits the codes plus the exact reconstruction error the
    * encoding pays. The quality number a real pipeline watches when it
    * chooses block/centroid counts.
    *
    * Scale: per block, training is the quantizer's broadcast-assign loop
    * (zero vector shuffle); encoding is one map over the vectors with the
    * k-row codebook broadcast; the 4 per-block frames join back on
    * vec_id. Everything downstream of the scan is map/broadcast work. */
  /** The exact-IEEE squared distance fold both the trainer and the q85
    * oracle use (left-to-right, float cast to double per element). */
  private def pqD2(vec: Column, cen: Column): Column =
    graft.functions.VectorD2.d2(vec, cen)

  /** Per PQ block: (sub-vectors, assignment, centroids) from the
    * deterministic trainer — shared by [[q147]] (encoding), [[q148]]
    * (ADC search evaluation) and [[q151]] (IVF-PQ serving). The trained
    * CODEBOOKS (k=8 rows × 4 blocks — tiny) are memoized per
    * (application, data dir) via [[ArtifactMemo]]: the three gates used
    * to re-run the 4-block Lloyd training each, where a production
    * pipeline trains codebooks once per corpus version and every query
    * reads them. Only the centroids persist — the per-vector assignment
    * is recomputed per gate as the map-side broadcast argmin
    * ([[graft.operators.KMeansQuantizer.assignTo]]), which costs one map
    * over the vectors (persisting it instead costs a fact-sized write,
    * which an A/B showed eats the entire saving). Training is
    * deterministic (data-seeded, fixed-point sums), so loaded codebooks
    * are bit-identical to inline retraining. */
  private def pqTrain(s: SparkSession, d: String)
      : Seq[(DataFrame, DataFrame, DataFrame)] = {
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    def sub(b: Int) = base.select(col("vec_id"),
      slice(col("embedding"), b * PqDims + 1, PqDims).as("embedding"))
    val root = ArtifactMemo.path(s, d, s"pq${PqBlocks}x$PqK") { out =>
      // the 4 block trainings are fully independent (disjoint slices,
      // disjoint output dirs, no session-conf mutation in the trainer),
      // so they submit their Lloyd-round jobs CONCURRENTLY — the
      // scheduler interleaves the small jobs' scheduling gaps instead of
      // serializing 4 × (rounds × per-job latency); exactly what a
      // production pipeline does with per-block training jobs. Results
      // are bit-identical to sequential training (nothing shared).
      import scala.collection.parallel.CollectionConverters._
      (0 until PqBlocks).par.foreach { b =>
        graft.operators.KMeansQuantizer.trainCentroids(
            sub(b), k = PqK, iterations = PqRounds)
          .write.mode("overwrite").parquet(s"$out/cents$b")
      }
    }
    (0 until PqBlocks).map { b =>
      val cents = s.read.parquet(s"$root/cents$b")
      (sub(b), graft.operators.KMeansQuantizer.assignTo(sub(b), cents), cents)
    }
  }

  /** Trigger the PQ-codebook memo build without running a consumer gate —
    * [[graft.Bench]]'s setup ledger times it as its own line. */
  private[graft] def buildPqMemo(s: SparkSession, d: String): Unit = {
    pqTrain(s, d); ()
  }

  def q147(s: SparkSession, d: String): DataFrame = {
    val perBlock = pqTrain(s, d).zipWithIndex.map { case ((sub, assign, cents), b) =>
      sub.join(assign, Seq("vec_id"))
        .join(broadcast(cents), Seq("cid"))
        .select(col("vec_id"), col("cid").as(s"code$b"),
          pqD2(col("embedding"), col("cvec")).as(s"err$b"))
    }
    val outCols = col("vec_id") +:
      (0 until PqBlocks).map(b => col(s"code$b")) :+
      Parity.fr((0 until PqBlocks).map(b => col(s"err$b"))
        .reduce(_ + _), 6).as("err2")
    perBlock.reduce(_.join(_, Seq("vec_id")))
      .select(outCols: _*)
      .orderBy(col("vec_id"))
  }

  /** Per-block `vb$b` slice + k-means chain CTEs — the training prefix
    * every PQ oracle (q147, q148, q151) starts from. */
  private def pqChainsSql: String = (0 until PqBlocks).map { b =>
    s"""vb$b AS (SELECT vec_id, e[${b * PqDims + 1}:${(b + 1) * PqDims}] e
       |        FROM v),
       |${SimilarityOps.kmeansCtes(s"vb$b", PqDims, PqK, PqRounds, s"pq${b}_")}"""
      .stripMargin
  }.mkString(",\n")

  val q147Sql: String = {
    val errCtes = (0 until PqBlocks).map { b =>
      s"""e$b AS (SELECT a.vec_id, a.cid, list_dot_product(
         |    list_transform(range($PqDims), i -> CAST(a.e[i+1] AS DOUBLE) - c.c[i+1]),
         |    list_transform(range($PqDims), i -> CAST(a.e[i+1] AS DOUBLE) - c.c[i+1])) err
         |  FROM pq${b}_a${PqRounds + 1} a
         |  JOIN pq${b}_c$PqRounds c ON a.cid = c.cid)""".stripMargin
    }.mkString(",\n")
    val codes = (0 until PqBlocks).map(b => s"e$b.cid code$b").mkString(", ")
    val errSum = (0 until PqBlocks).map(b => s"e$b.err").mkString(" + ")
    val joins = (1 until PqBlocks)
      .map(b => s"JOIN e$b ON e0.vec_id = e$b.vec_id").mkString(" ")
    s"""WITH v AS (SELECT vec_id, embedding e FROM embeddings),
       |$pqChainsSql,
       |$errCtes
       |SELECT e0.vec_id, $codes,
       |  floor(($errSum) * 1e6 + 0.5) / 1e6 err2
       |FROM e0 $joins ORDER BY e0.vec_id""".stripMargin
  }

  /** q148 — ADC search quality (asymmetric distance computation, the
    * query-time half of PQ): each query keeps its EXACT sub-block
    * distances to every codebook centroid (a 4-block × k lookup table),
    * database
    * vectors contribute only their 3-bit codes, and the approximate
    * distance is the sum of the per-block table lookups. The gate runs
    * ADC top-5 against exact L2 top-5 and reports recall@5 per query —
    * the number that decides whether the PQ geometry (blocks × centroids)
    * is fit for serving. On the near-uniform synthetic embeddings the
    * honest answer is "not at 12 bits/vector" (mean recall ≈ 0.24): the
    * gate pins the MEASUREMENT, exactly what it exists to surface before
    * a production rollout picks bigger codebooks.
    *
    * Scale: the LUT side is (queries × k) rows per block — broadcast; the
    * database side ships CODES ONLY (the whole point of PQ: the 64-float
    * vector never moves at query time); top-5 via the bounded native
    * top-k aggregate, no collect anywhere. */
  /** Per-block query LUT frames (q$b, c$b, d$b) — the broadcast side of
    * ADC scoring, shared by [[q148]] and [[q151]]: each query's exact
    * distance to every sub-block centroid, ≤ queries × [[PqK]] rows. */
  private def pqQueryLuts(parts: Seq[(DataFrame, DataFrame, DataFrame)])
      : Seq[DataFrame] =
    parts.zipWithIndex.map { case ((sub, _, cents), b) =>
      sub.filter(col("vec_id") < 10)
        .select(col("vec_id").as(s"q$b"), col("embedding").as("qe"))
        .crossJoin(broadcast(cents))
        .select(col(s"q$b"), col("cid").as(s"c$b"),
          pqD2(col("qe"), col("cvec")).as(s"d$b"))
    }

  def q148(s: SparkSession, d: String): DataFrame = {
    val parts = pqTrain(s, d)
    val codes = parts.zipWithIndex.map { case ((_, a, _), b) =>
      a.select(col("vec_id"), col("cid").as(s"code$b"))
    }.reduce(_.join(_, Seq("vec_id")))
    val lutsR = pqQueryLuts(parts)
    val adc = (1 until PqBlocks).foldLeft(
        codes.join(broadcast(lutsR.head), col("code0") === col("c0"))) {
        (acc, b) =>
          acc.join(broadcast(lutsR(b)),
            col(s"code$b") === col(s"c$b") && col("q0") === col(s"q$b"))
      }
      .filter(col("vec_id") =!= col("q0"))
      .select(col("q0").as("qid"), col("vec_id").as("nid"),
        (0 until PqBlocks).map(b => col(s"d$b")).reduce(_ + _).as("adc"))
    val adc5 = adc.groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(-col("adc"), col("nid"), 5).as("t"))
      .select(col("qid"), transform(col("t"), _.getField("id")).as("adc_ids"))
    val v = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val exact5 = broadcast(v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .crossJoin(v.select(col("vec_id").as("nid"), col("embedding").as("cv")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        pqD2(col("qv"), transform(col("cv"), _.cast("double"))).as("d"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(-col("d"), col("nid"), 5).as("t"))
      .select(col("qid"), transform(col("t"), _.getField("id")).as("exact_ids"))
    exact5.join(adc5, Seq("qid"))
      .select(col("qid").as("query_id"),
        size(col("exact_ids")).cast("long").as("n_exact"),
        size(col("adc_ids")).cast("long").as("n_adc"),
        size(array_intersect(col("exact_ids"), col("adc_ids")))
          .cast("long").as("hits"))
      .withColumn("recall", col("hits").cast("double") / 5)
      .orderBy(col("query_id"))
  }

  /** Shared oracle CTE block for the PQ serving path (q148, q151): the
    * per-block chains, `cd` (per-vector codes) and `lut0..3` (per-query
    * block LUTs). Prepend `v AS (SELECT vec_id, embedding e FROM
    * embeddings)`. */
  private def pqSearchCtes: String = {
    val codeJoin = (1 until PqBlocks)
      .map(b => s"JOIN pq${b}_a${PqRounds + 1} a$b ON a0.vec_id = a$b.vec_id")
      .mkString(" ")
    val codeCols = (0 until PqBlocks).map(b => s"a$b.cid code$b").mkString(", ")
    val lutCtes = (0 until PqBlocks).map { b =>
      s"""lut$b AS (SELECT q.vec_id qid, c.cid,
         |    list_dot_product(
         |      list_transform(range($PqDims), i -> CAST(q.e[i+1] AS DOUBLE) - c.c[i+1]),
         |      list_transform(range($PqDims), i -> CAST(q.e[i+1] AS DOUBLE) - c.c[i+1])) d
         |  FROM (SELECT vec_id, e FROM vb$b WHERE vec_id < 10) q
         |  CROSS JOIN pq${b}_c$PqRounds c)""".stripMargin
    }.mkString(",\n")
    s"""$pqChainsSql,
       |cd AS (SELECT a0.vec_id, $codeCols
       |       FROM pq0_a${PqRounds + 1} a0 $codeJoin),
       |$lutCtes""".stripMargin
  }

  /** Exact-L2 top-5 oracle CTEs (`ex`, `ex5`) for the PQ eval gates. */
  private val ExactTop5Ctes: String =
    s"""ex AS (SELECT q.vec_id qid, c.vec_id nid,
       |    list_dot_product(
       |      list_transform(range(64), i -> CAST(q.e[i+1] AS DOUBLE) - CAST(c.e[i+1] AS DOUBLE)),
       |      list_transform(range(64), i -> CAST(q.e[i+1] AS DOUBLE) - CAST(c.e[i+1] AS DOUBLE))) d
       |  FROM (SELECT * FROM v WHERE vec_id < 10) q
       |  JOIN v c ON c.vec_id <> q.vec_id),
       |ex5 AS (SELECT qid, list(nid ORDER BY rn) ids FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY d, nid) rn FROM ex) WHERE rn <= 5 GROUP BY qid)"""
      .stripMargin

  private val PqAdcSum: String =
    (0 until PqBlocks).map(b => s"l$b.d").mkString(" + ")

  val q148Sql: String = {
    val lutJoin = (1 until PqBlocks)
      .map(b => s"JOIN lut$b l$b ON l$b.qid = l0.qid AND l$b.cid = cd.code$b")
      .mkString(" ")
    s"""WITH v AS (SELECT vec_id, embedding e FROM embeddings),
       |$pqSearchCtes,
       |adc AS (SELECT l0.qid, cd.vec_id nid, $PqAdcSum adc
       |        FROM cd JOIN lut0 l0 ON l0.cid = cd.code0 $lutJoin
       |        WHERE cd.vec_id <> l0.qid),
       |adc5 AS (SELECT qid, list(nid ORDER BY rn) ids FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY adc, nid) rn FROM adc) WHERE rn <= 5 GROUP BY qid),
       |$ExactTop5Ctes
       |SELECT x.qid query_id,
       |  CAST(len(x.ids) AS BIGINT) n_exact,
       |  CAST(len(a.ids) AS BIGINT) n_adc,
       |  CAST(len(list_intersect(x.ids, a.ids)) AS BIGINT) hits,
       |  CAST(len(list_intersect(x.ids, a.ids)) AS DOUBLE) / 5 recall
       |FROM ex5 x JOIN adc5 a ON a.qid = x.qid
       |ORDER BY query_id""".stripMargin
  }

  /** Samples drawn per (lang, source) shard in [[q149]]. */
  val SamplePerShard = 4L

  /** q149 — weight-proportional systematic sampling (the "sample K docs
    * per shard with probability ∝ quality weight" step of corpus mixing,
    * where q107's quota sampler counts heads and q83's splitter hashes
    * uniformly): walk each shard in doc_id order accumulating integer
    * weights (here n_chars — any BIGINT quality score works), and select
    * the documents where `floor(K·cum/total)` advances. The K slots
    * always sum up (`Σ n_slots = K` per shard); a document heavier than
    * total/K absorbs several slots while being emitted once — the
    * standard PPS-without-replacement cap, surfaced in the `n_slots`
    * column. Zero RNG, integer-only — heavier documents proportionally
    * likelier, the low-variance systematic design instead of Poisson
    * draws. A shard whose weights are all zero has `total = 0` and is
    * filtered out before any division runs (ANSI `div` would throw on
    * zero) — "sample proportional to zero mass" selects nothing, on both
    * engines.
    *
    * Scale: the cumulative window and the total are both per (lang,
    * source) shard — the bounded packing shard, never a global sort; the
    * totals join is shard-keyed. */
  /** The PPS-systematic core shared by [[q149]] and the composed
    * pipeline [[q150]]: `df` must carry (doc_id, lang, source, wt);
    * returns the picked rows with their `n_slots` multiplicity. One
    * implementation so the composed gate samples with exactly the q149
    * rule (the same reason [[dsirScores]] is shared). */
  private def systematicPicks(df: DataFrame, K: Long): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    // shard totals as a SECOND window over the same partitioning, not a
    // groupBy+self-join: the join form duplicated the upstream plan (for
    // q150 that upstream is dsirScores) across both branches — exchange
    // reuse recovered most of the recompute, so the measured win is the
    // residual join itself (ProfileOne sf0.1: q150 warm 1.50 -> 1.43 s,
    // q149 ~0.45 s both forms), but the single-window plan also cannot
    // LOSE reuse when an upstream change breaks exchange identity
    df.withColumn("cum", sum(col("wt")).over(w))
      .withColumn("total",
        max(col("cum")).over(Window.partitionBy(col("lang"), col("source"))))
      // a zero-mass shard emits nothing — filter BEFORE the division:
      // this Spark build runs ANSI mode, where `div 0` THROWS (DuckDB's
      // `// 0` returns NULL and the n_slots > 0 filter drops the shard)
      .filter(col("total") > 0)
      .withColumn("n_slots",
        expr(s"($K * cum) div total") - expr(s"($K * (cum - wt)) div total"))
      .filter(col("n_slots") > 0)
  }

  /** DuckDB twin of [[systematicPicks]]: CTEs `t`/`tot`/`picks` over a
    * source CTE exposing (doc_id, lang, source, wt, ...). */
  private def systematicPicksSql(srcCte: String, K: Long): String =
    s"""t AS (SELECT *, CAST(sum(wt) OVER (PARTITION BY lang, source
       |      ORDER BY doc_id) AS BIGINT) cum FROM $srcCte),
       |tot AS (SELECT lang, source, CAST(max(cum) AS BIGINT) total
       |        FROM t GROUP BY 1, 2),
       |picks AS (
       |  SELECT t.*, ($K * cum) // total - ($K * (cum - wt)) // total
       |           n_slots
       |  FROM t JOIN tot USING (lang, source)
       |  WHERE ($K * cum) // total - ($K * (cum - wt)) // total > 0)"""
      .stripMargin

  def q149(s: SparkSession, d: String): DataFrame =
    systematicPicks(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars").as("wt")),
      SamplePerShard)
      .select(col("lang"), col("source"), col("doc_id"), col("wt"),
        col("n_slots"))
      .orderBy(col("lang"), col("source"), col("doc_id"))

  val q149Sql: String =
    s"""WITH src AS (SELECT doc_id, lang, source, n_chars wt FROM documents),
       |${systematicPicksSql("src", SamplePerShard)}
       |SELECT lang, source, doc_id, wt, n_slots
       |FROM picks ORDER BY lang, source, doc_id""".stripMargin

  /** q150 — the composed SELECTION release pipeline, one declarative
    * plan: DSIR importance scoring ([[dsirScores]]) feeds
    * weight-proportional systematic sampling (the q149 design with the
    * DSIR score as the weight — distribution-matched AND size-controlled
    * selection in one pass), rolled up into the per-language release
    * summary a curator signs off on. The composed twin for the selection
    * layer, as `curateV2` (q126) is for the cleaning layer.
    *
    * Scale: inherits the stages' postures — bounded broadcast weight dim,
    * shard-bounded windows, shard-keyed totals join; the rollup is one
    * lang-keyed aggregation. */
  def q150(s: SparkSession, d: String): DataFrame =
    systematicPicks(dsirScores(s, d).withColumn("wt", col("score")),
      SamplePerShard)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_slots")).as("n_slots"),
        sum(col("score")).as("score_mass"),
        sum(col("n_bigrams")).as("n_bigrams"))
      .orderBy(col("lang"))

  val q150Sql: String =
    s"""WITH $DsirCtes,
       |src AS (SELECT *, score wt FROM sc),
       |${systematicPicksSql("src", SamplePerShard)}
       |SELECT lang, count(*)::BIGINT n_sampled,
       |  CAST(sum(n_slots) AS BIGINT) n_slots,
       |  CAST(sum(score) AS BIGINT) score_mass,
       |  CAST(sum(n_bigrams) AS BIGINT) n_bigrams
       |FROM picks GROUP BY lang ORDER BY lang""".stripMargin

  /** q151 — the complete IVF-PQ serving path (Jégou et al. 2011 end to
    * end): queries route to their top-2 IVF cells (the fixed LCG coarse
    * centroids of q52/q76/q90), only the CODES of vectors in probed cells
    * are scored — by the q148 ADC lookup — and the probed top-5 is graded
    * against exact L2 top-5. This is the query a production ANN service
    * runs: coarse routing bounds the candidate set, PQ codes bound the
    * bytes touched per candidate, and the gate reports both the candidate
    * count and the recall that geometry buys.
    *
    * Scale: routing is a map over literal centroids (no shuffle); the
    * candidate join is cell-keyed; the LUT side stays queries × k per
    * block (broadcast); nothing ships full vectors except the bounded
    * query set's own LUT build. */
  def q151(s: SparkSession, d: String): DataFrame = {
    val parts = pqTrain(s, d)
    val codes = parts.zipWithIndex.map { case ((_, a, _), b) =>
      a.select(col("vec_id"), col("cid").as(s"code$b"))
    }.reduce(_.join(_, Seq("vec_id")))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("v"))
    // database-side routing: argmax_j score_j, ties to the smaller j
    val cellCol = -greatest((0 until 8).map(j =>
      struct(SimilarityOps.ivfCellScore(col("v"), j).as("score"),
        lit(-j).as("nj"))): _*).getField("nj")
    val cells = e.select(col("vec_id"), cellCol.as("cell"))
    // query-side multiprobe: top-2 cells per query
    val probes = e.filter(col("vec_id") < 10)
      .withColumn("sc", explode(array((0 until 8).map(j =>
        struct(SimilarityOps.ivfCellScore(col("v"), j).as("score"),
          lit(j).as("j"))): _*)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("sc.score").desc, col("sc.j"))))
      .filter(col("rn") <= 2)
      .select(col("vec_id").as("qid"), col("sc.j").as("pcell"))
    val lutsR = pqQueryLuts(parts)
    val cand = codes.join(cells, Seq("vec_id"))
      .join(probes, col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
    val adc = (0 until PqBlocks).foldLeft(cand) { (acc, b) =>
        acc.join(broadcast(lutsR(b)),
          col(s"code$b") === col(s"c$b") && col("qid") === col(s"q$b"))
      }
      .select(col("qid"), col("vec_id").as("nid"),
        (0 until PqBlocks).map(b => col(s"d$b")).reduce(_ + _).as("adc"))
    val nCand = adc.groupBy(col("qid")).agg(count(lit(1)).as("n_cand"))
    val ivf5 = adc.groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(-col("adc"), col("nid"), 5).as("t"))
      .select(col("qid"), transform(col("t"), _.getField("id")).as("ivf_ids"))
    val exact5 = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv")))
      .crossJoin(e.select(col("vec_id").as("nid"), col("v").as("cv")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        pqD2(col("qv"), transform(col("cv"), _.cast("double"))).as("d"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(-col("d"), col("nid"), 5).as("t"))
      .select(col("qid"), transform(col("t"), _.getField("id")).as("exact_ids"))
    exact5.join(ivf5, Seq("qid"), "left").join(nCand, Seq("qid"), "left")
      .select(col("qid").as("query_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(size(array_intersect(col("exact_ids"), col("ivf_ids"))), lit(0))
          .cast("long").as("hits"))
      .withColumn("recall", col("hits").cast("double") / 5)
      .orderBy(col("query_id"))
  }

  val q151Sql: String = {
    val lutJoin = (0 until PqBlocks)
      .map(b => s"JOIN lut$b l$b ON l$b.qid = cand.qid AND l$b.cid = cand.code$b")
      .mkString(" ")
    val codeCols = (0 until PqBlocks).map(b => s"cd.code$b").mkString(", ")
    s"""WITH v AS (SELECT vec_id, embedding e FROM embeddings),
       |$pqSearchCtes,
       |cj AS (SELECT j, list_transform(range(64), i ->
       |    ((1103515245 * (100000 + j * 64 + i) + 12345) % 2147483648)
       |      / 2147483648.0 - 0.5) AS c
       |  FROM generate_series(0, 7) t(j)),
       |asn AS (SELECT vec_id,  j,
       |    list_dot_product(list_transform(e, x -> CAST(x AS DOUBLE)), c)
       |      - list_dot_product(c, c) / 2.0 AS score
       |  FROM v CROSS JOIN cj),
       |cells AS (SELECT vec_id, j AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, j) rn FROM asn) WHERE rn = 1),
       |probes AS (SELECT vec_id qid, j pcell FROM (
       |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, j) rn FROM asn WHERE vec_id < 10)
       |  WHERE rn <= 2),
       |cand AS (SELECT p.qid, c.vec_id, $codeCols
       |         FROM probes p JOIN cells c ON c.cell = p.pcell
       |           AND c.vec_id <> p.qid
       |         JOIN cd ON cd.vec_id = c.vec_id),
       |adc AS (SELECT cand.qid, cand.vec_id nid, $PqAdcSum adc
       |        FROM cand $lutJoin),
       |nc AS (SELECT qid, count(*)::BIGINT n_cand FROM adc GROUP BY qid),
       |ivf5 AS (SELECT qid, list(nid ORDER BY rn) ids FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY adc, nid) rn FROM adc) WHERE rn <= 5 GROUP BY qid),
       |$ExactTop5Ctes
       |SELECT x.qid query_id,
       |  CAST(coalesce(nc.n_cand, 0) AS BIGINT) n_cand,
       |  CAST(coalesce(len(list_intersect(x.ids, i.ids)), 0) AS BIGINT) hits,
       |  CAST(coalesce(len(list_intersect(x.ids, i.ids)), 0) AS DOUBLE) / 5
       |    recall
       |FROM ex5 x LEFT JOIN ivf5 i ON i.qid = x.qid
       |LEFT JOIN nc ON nc.qid = x.qid
       |ORDER BY query_id""".stripMargin
  }

  /** Minimum cell size for the [[q152]] release. */
  val KAnonMin = 7L

  /** q152 — k-anonymous release aggregation (the minimum-cell-size rule
    * every public data release applies): per-(lang, source) corpus stats
    * are published only for groups of at least [[KAnonMin]] documents;
    * every smaller group is pooled into ONE residual row, so no released
    * row describes fewer than k individuals and the totals still
    * reconcile. The privacy gate a data-card pipeline (q136) runs before
    * the card leaves the building.
    *
    * Scale: one grouped aggregation plus a 1-row residual fold — the
    * suppression adds no shuffle beyond the release rollup itself. */
  def q152(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
    val big = g.filter(col("n_docs") >= KAnonMin)
    val pooled = g.filter(col("n_docs") < KAnonMin)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .select(lit("_suppressed_").as("lang"), lit("_pooled_").as("source"),
        col("n_docs"), col("n_tokens"))
      .filter(col("n_docs") > 0)
    big.unionByName(pooled).orderBy(col("lang"), col("source"))
  }

  val q152Sql: String =
    s"""WITH g AS (SELECT lang, source, count(*)::BIGINT n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) n_tokens
       |  FROM documents GROUP BY 1, 2)
       |SELECT lang, source, n_docs, n_tokens FROM g WHERE n_docs >= $KAnonMin
       |UNION ALL
       |SELECT '_suppressed_', '_pooled_', CAST(sum(n_docs) AS BIGINT),
       |  CAST(sum(n_tokens) AS BIGINT)
       |FROM g WHERE n_docs < $KAnonMin HAVING count(*) > 0
       |ORDER BY lang, source""".stripMargin

  /** q153 — temperature-smoothed multilingual mixing rates (the α=0.5
    * rebalancing of mT5/XLM-R: sampling mass ∝ tokens^α lifts low-resource
    * languages without flattening the mix): per language, the natural
    * token share, the smoothed target share, and the resulting up/down-
    * sampling factor. Integer-exact across engines because α=1/2 is the
    * one temperature with an exact portable form — `floor(sqrt(n))` on a
    * BIGINT is bit-identical in both engines (IEEE sqrt is correctly
    * rounded; n ≪ 2^52), so no pow()/ln() enters the plan ([[Parity]]
    * bans transcendentals). Shares and factors in fixed-point ppm /
    * milli-x, BIGINT division.
    *
    * Scale: a per-lang aggregate (≤ language-count rows) and one
    * broadcast total — nothing corpus-sized moves. */
  def q153(s: SparkSession, d: String): DataFrame = {
    val lt = Tables.documents(s, d)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .groupBy(col("lang")).agg(sum(col("ntok")).as("tok"))
      .withColumn("isq", floor(sqrt(col("tok"))).cast("long"))
    val tot = lt.agg(sum(col("tok")).as("T"), sum(col("isq")).as("S"))
    // overflow-safe fixed point: above 10^6 totals divide the DENOMINATOR
    // (no multiplication of a corpus-scale count — 10^6 · 10^13 tokens
    // would overflow BIGINT on both engines); below, the exact product
    // form (the fixture path). Same branch taken by both engines.
    def ppm(num: String, den: String): Column =
      when(col(den) >= 1000000L, expr(s"$num div ($den div 1000000)"))
        .otherwise(expr(s"(1000000 * $num) div $den"))
    lt.crossJoin(broadcast(tot))
      .select(col("lang"), col("tok"),
        ppm("tok", "T").as("natural_ppm"),
        ppm("isq", "S").as("rate_ppm"))
      // a sub-ppm tail language has natural_ppm = 0: the factor is
      // undefined (NULL), not a crash — ANSI `div 0` throws, DuckDB's
      // `// 0` NULLs, so guard the branch explicitly
      .withColumn("upsample_milli",
        when(col("natural_ppm") > 0,
          expr("(1000 * rate_ppm) div natural_ppm")))
      .orderBy(col("lang"))
  }

  val q153Sql: String = {
    def ppm(num: String, den: String): String =
      s"CASE WHEN $den >= 1000000 THEN $num // ($den // 1000000) " +
        s"ELSE (1000000 * $num) // $den END"
    s"""WITH lt AS (SELECT lang,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) tok
       |  FROM documents GROUP BY lang),
       |i AS (SELECT lang, tok, CAST(floor(sqrt(tok)) AS BIGINT) isq FROM lt),
       |tot AS (SELECT CAST(sum(tok) AS BIGINT) T, CAST(sum(isq) AS BIGINT) S
       |        FROM i),
       |r AS (SELECT lang, tok,
       |        ${ppm("tok", "T")} natural_ppm,
       |        ${ppm("isq", "S")} rate_ppm
       |      FROM i CROSS JOIN tot)
       |SELECT lang, tok, natural_ppm, rate_ppm,
       |  CASE WHEN natural_ppm > 0
       |    THEN (1000 * rate_ppm) // natural_ppm END upsample_milli
       |FROM r ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_dsir_weights" -> (q143 _), "q144_bloom_screen" -> (q144 _),
    "q145_semantic_dedup" -> (q145 _), "q146_coreset_kcenter" -> (q146 _),
    "q147_pq_codes" -> (q147 _), "q148_pq_adc_recall" -> (q148 _),
    "q149_weighted_sample" -> (q149 _), "q150_selection_pipeline" -> (q150 _),
    "q151_ivfpq_search" -> (q151 _), "q152_kanon_release" -> (q152 _),
    "q153_temperature_mix" -> (q153 _))

  val oracle: Map[String, String] = Map(
    "q143_dsir_weights" -> q143Sql, "q144_bloom_screen" -> q144Sql,
    "q145_semantic_dedup" -> q145Sql, "q146_coreset_kcenter" -> q146Sql,
    "q147_pq_codes" -> q147Sql, "q148_pq_adc_recall" -> q148Sql,
    "q149_weighted_sample" -> q149Sql, "q150_selection_pipeline" -> q150Sql,
    "q151_ivfpq_search" -> q151Sql, "q152_kanon_release" -> q152Sql,
    "q153_temperature_mix" -> q153Sql)
}
