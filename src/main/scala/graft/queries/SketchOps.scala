package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.cdc.ChangelogApply
import graft.functions.TopKByScore

/** Scale-pipeline utility gates: incremental aggregate maintenance from a
  * changelog (q81), KMV distinct-count sketching (q82), and the
  * deterministic stratified train/val/test split (q83). All three are
  * building blocks a 100 TB curation pipeline runs daily; each is gated
  * against a DuckDB oracle computing the identical arithmetic.
  */
object SketchOps {

  /** q81 — incremental aggregate maintenance ([[ChangelogApply]], the
    * consume side of §2.10): base = per-user purchase totals before the
    * split instant; changelog = the later events rendered as auditlog ops
    * (signup→create, purchase→write +7-cent bump, error→unlink). The
    * maintained aggregate touches only changed keys — the oracle folds the
    * same algebra in SQL. Values in integer cents (exact; incremental and
    * recomputed floats would drift). */
  def q81(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("c", floor(col("value") * 100 + 0.5).cast("long"))
    val split = "2024-01-16 00:00:00"
    val base = ev.filter(col("ts") < lit(split) && col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(col("c")).as("total"), count(lit(1)).as("n"))
    val changelog = ev.filter(col("ts") >= lit(split))
      .filter(col("event_type").isin("signup", "purchase", "error"))
      .select(col("user_id"),
        when(col("event_type") === "signup", "create")
          .when(col("event_type") === "error", "unlink")
          .otherwise("write").as("op"),
        col("c").as("old_value"), (col("c") + 7).as("new_value"))
    ChangelogApply.applySums(base, changelog, "user_id")
      .orderBy("user_id")
  }

  val q81Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, ts,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) c
      |  FROM events),
      |base AS (
      |  SELECT user_id, sum(c) total, count(*) n FROM ev
      |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND event_type = 'purchase'
      |  GROUP BY 1),
      |delta AS (
      |  SELECT user_id,
      |    sum(CASE event_type WHEN 'signup' THEN c + 7
      |        WHEN 'error' THEN -c ELSE 7 END) d_total,
      |    sum(CASE event_type WHEN 'signup' THEN 1
      |        WHEN 'error' THEN -1 ELSE 0 END) d_n
      |  FROM ev
      |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
      |    AND event_type IN ('signup', 'purchase', 'error')
      |  GROUP BY 1)
      |SELECT user_id,
      |  CAST(coalesce(b.total, 0) + coalesce(d.d_total, 0) AS BIGINT) AS total,
      |  CAST(coalesce(b.n, 0) + coalesce(d.d_n, 0) AS BIGINT) AS n
      |FROM base b FULL OUTER JOIN delta d USING (user_id)
      |WHERE coalesce(b.n, 0) + coalesce(d.d_n, 0) > 0
      |ORDER BY user_id""".stripMargin

  /** KMV sketch size. */
  val K = 64

  /** q82 — KMV (k-minimum-values) distinct-count sketch per language:
    * vocabulary size estimated from the K smallest distinct word hashes,
    * est = (K−1)·M / h_K (Bar-Yossef et al.; exact count when the group
    * has fewer than K values). The per-group k-minimum state rides the
    * native bounded [[TopKByScore]] aggregate — map-side combinable, the
    * exchange carries ≤ K longs per group no matter how many words feed
    * it. Hashes are [[Parity.strHash]], so DuckDB computes the identical
    * sketch (row_number window at gate scale). */
  def q82(s: SparkSession, d: String): DataFrame = {
    val wh = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("lang"), Parity.strHash(col("w")).as("h"))
      .distinct()
    wh.groupBy(col("lang"))
      .agg(count(lit(1)).as("exact_distinct"),
        TopKByScore.topK(-col("h").cast("double"), col("h"), K).as("mins"))
      .select(col("lang"), col("exact_distinct"),
        when(col("exact_distinct") < K, col("exact_distinct").cast("double"))
          .otherwise(Parity.fr(
            lit((K - 1).toDouble * Parity.HashM) / element_at(col("mins"), K)("id"),
            2)).as("est_distinct"))
      .orderBy("lang")
  }

  val q82Sql: String =
    s"""WITH wh AS (
      |  SELECT DISTINCT lang, ${Parity.strHashSql("w")} h
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) w FROM documents)
      |  WHERE w <> ''),
      |rk AS (SELECT lang, h,
      |         row_number() OVER (PARTITION BY lang ORDER BY h) rn FROM wh),
      |agg AS (SELECT lang, count(*) cnt FROM wh GROUP BY 1),
      |kth AS (SELECT lang, h FROM rk WHERE rn = $K)
      |SELECT a.lang, CAST(a.cnt AS BIGINT) AS exact_distinct,
      |  CASE WHEN a.cnt < $K THEN a.cnt::DOUBLE
      |       ELSE floor(${(K - 1).toDouble} * 2147483647 / k.h * 100 + 0.5) / 100
      |  END AS est_distinct
      |FROM agg a LEFT JOIN kth k USING (lang)
      |ORDER BY lang""".stripMargin

  /** q83 — deterministic stratified train/val/test split: bucket =
    * (doc_id · Knuth-multiplier) mod 1000 → 80/10/10. Pure map-side, no
    * sampling state, reproducible across engines and runs — the property a
    * training-data pipeline needs so re-runs don't leak val into train.
    * Gated on per-(lang, split) document and token counts. */
  def q83(s: SparkSession, d: String): DataFrame = {
    val b = pmod(col("doc_id") * lit(2654435761L), lit(1000L))
    Tables.documents(s, d)
      .withColumn("split",
        when(b < 800, "train").when(b < 900, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy("lang", "split")
  }

  val q83Sql: String =
    """SELECT lang,
      |  CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
      |       WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |FROM documents
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** q91 — fixed-width histogram of document lengths per language
    * (`width_bucket`, identical binning semantics in both engines): the
    * length-distribution profile a curation pipeline inspects before
    * picking quality cut-offs. One map-side bucket assignment + one
    * grouped count — the 100 TB histogram plan. */
  def q91(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        width_bucket(col("n_chars").cast("double"), lit(0.0), lit(2000.0), lit(10))
          .as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("bucket"))

  /** DuckDB has no width_bucket; the oracle spells out the same binning
    * ((2000−0)/10 = width 200.0 exactly, so the division is identical). */
  val q91Sql: String =
    """SELECT lang,
      |  CASE WHEN n_chars < 0 THEN 0
      |       WHEN n_chars >= 2000 THEN 11
      |       ELSE CAST(floor(CAST(n_chars AS DOUBLE) / 200.0) AS BIGINT) + 1
      |  END AS bucket,
      |  count(*) AS n_docs
      |FROM documents
      |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_cdc_apply" -> (q81 _), "q82_kmv_distinct" -> (q82 _),
    "q83_stratified_split" -> (q83 _), "q91_histogram" -> (q91 _))

  def oracle: Map[String, String] = Map(
    "q81_cdc_apply" -> q81Sql, "q82_kmv_distinct" -> q82Sql,
    "q83_stratified_split" -> q83Sql, "q91_histogram" -> q91Sql)
}
