package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine Lloyd's k-means — the trainer for the IVF coarse quantizer
  * (the `SimilarityOps` IVF queries assign vectors to fixed cells; a real
  * 100 TB ANN pipeline first TRAINS those cells on a sample, re-trains on
  * drift, and re-buckets. Cf. the IVF literature referenced in PAPERS.md).
  *
  * Determinism contract (what makes this gate-able against DuckDB, and —
  * the same property — makes training REPRODUCIBLE across cluster sizes):
  *  - seeding is data-deterministic (the k smallest `vec_id`s), no RNG;
  *  - assignment distance is a strict left-to-right IEEE fold, ties go to
  *    the smaller centroid id;
  *  - centroid updates sum the QUANTIZED coordinates (floor(x·10⁶ + 0.5))
  *    in BIGINT — exact and order-free, where a float sum would depend on
  *    partition/merge order — and divide once at the end.
  *
  * Scale: assignment is a broadcast of k tiny centroid rows against the
  * vector table (map-side, no shuffle of the vectors); the update is one
  * groupBy on (cid, dim) with map-side partial sums. Each round's centroid
  * table is localCheckpoint-ed, so `iterations` rounds build flat plans. */
object KMeansQuantizer {

  private val Q = 1000000.0

  // native codegen'd kernel (r18): bit-identical to the former
  // aggregate(zip_with(...)) fold on null-free vectors, without the
  // per-row zipped-array allocation and per-element lambda dispatch
  private def d2(vec: Column, cen: Column): Column =
    graft.functions.VectorD2.d2(vec, cen)

  /** Map-side nearest-centroid assignment of `vecs` (`vec_id`,
    * `embedding`) to a persisted `centroids` frame (`cid`, `cvec`) — the
    * same broadcast-argmin every trainer round runs, exposed for
    * consumers that LOAD codebooks instead of retraining (the PQ memo):
    * the k centroid rows collapse into one broadcast row, ties go to the
    * smaller cid, zero shuffle of the vectors. */
  def assignTo(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cenArr = centroids.agg(collect_list(struct(col("cid"), col("cvec"))).as("cs"))
    vecs.crossJoin(broadcast(cenArr))
      .select(col("vec_id"),
        array_min(transform(col("cs"),
          cc => struct(d2(col("embedding"), cc.getField("cvec")).as("d"),
            cc.getField("cid").as("cid")))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
  }

  /** `vecs`: (`vec_id` long, `embedding` array<float>). Returns
    * (assignment, centroids) after `iterations` Lloyd rounds:
    * assignment = (vec_id, cid) under the FINAL centroids,
    * centroids = (cid, cvec array<double>). Empty clusters drop out. */
  def train(vecs: DataFrame, k: Int, iterations: Int): (DataFrame, DataFrame) = {
    // cached: every Lloyd round (and the final assignment) rescans the
    // vector table for the broadcast-assign step
    val v = vecs.select(col("vec_id"), col("embedding")).cache()
    val centroids = lloyd(v, k, iterations)
    // materialize the final assignment, then RELEASE the vector cache —
    // train() must not pin the embedding set for the session's lifetime
    // (a composed pipeline keeps running after training)
    val assignment = assignTo(v, centroids).localCheckpoint(true)
    v.unpersist()
    (assignment, centroids)
  }

  /** Centroids ONLY — for codebook memo builders ([[graft.queries]]'
    * ArtifactMemo consumers) that persist the trained centroids and
    * recompute per-vector assignments later as the broadcast argmin:
    * skips [[train]]'s final full-table assignment pass, which those
    * callers discard. Eagerly materialized before the vector cache
    * releases (the builder writes it to parquet immediately anyway). */
  def trainCentroids(vecs: DataFrame, k: Int, iterations: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), col("embedding")).cache()
    val centroids = lloyd(v, k, iterations).localCheckpoint(true)
    v.unpersist()
    centroids
  }

  /** The Lloyd rounds over a cached vector frame: seed from the k
    * smallest ids, then `iterations` broadcast-assign + quantized-sum
    * update rounds. The returned final-round centroids are a LAZY local
    * checkpoint — callers materialize (or chain) before releasing `v`. */
  private def lloyd(v: DataFrame, k: Int, iterations: Int): DataFrame = {
    // Seed from the k smallest vec_ids actually present (TakeOrdered, k is
    // tiny) — unlike `vec_id < k` this yields exactly min(k, |v|) seeds for
    // sparse or non-0-based id spaces.
    var centroids = v.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), _.cast("double")).as("cvec"))
      .localCheckpoint(true)

    // Assignment is fully MAP-SIDE: the k centroids collapse into a single
    // broadcast row holding an array of (cid, cvec) structs, and the argmin
    // is array_min over per-centroid (distance, cid) structs — the same
    // lexicographic (d, cid) minimum the previous groupBy(vec_id)-of-
    // min(struct) computed, with ties still going to the smaller cid, but
    // with ZERO shuffle of the vector table (the old shape exchanged
    // |v|·k rows keyed by the embedding array every round).
    def assign(c: DataFrame): DataFrame = {
      val cenArr = c.agg(collect_list(struct(col("cid"), col("cvec"))).as("cs"))
      v.crossJoin(broadcast(cenArr))
        .select(col("vec_id"), col("embedding"),
          array_min(transform(col("cs"),
            cc => struct(d2(col("embedding"), cc.getField("cvec")).as("d"),
              cc.getField("cid").as("cid")))).as("m"))
        .select(col("vec_id"), col("embedding"), col("m.cid").as("cid"))
    }

    var it = 0
    while (it < iterations) {
      val upd = assign(centroids)
        .select(col("cid"), posexplode(col("embedding")))
        .select(col("cid"), col("pos"),
          floor(col("col").cast("double") * Q + 0.5).cast("long").as("q"))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          (col("sq").cast("double") / (col("n") * lit(Q))).as("mean"))
      // LAZY checkpoint: lineage is truncated now; the k-row table
      // materializes when the next round (or the final assign) builds its
      // broadcast — no separate eager job per round.
      centroids = upd.groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cvec"))
        .localCheckpoint(false)
      it += 1
    }
    centroids
  }
}
