package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule audit — the Deequ-style "constraint
  * suite" a production ingestion pipeline runs before publishing a batch
  * (cf. the reference's upload validation loops, which check each row
  * imperatively: etl_stock/models/company.py bulk upload validation, and
  * etl_base's per-record constraint checks).
  *
  * Rule kinds:
  *   - [[RowRule]]: a boolean predicate every row must satisfy
  *     (not-null, range, enum membership, cross-column order).
  *   - [[UniqueRule]]: a key that must be unique (violations = rows
  *     beyond the first per key).
  *   - [[FkRule]]: a foreign key that must resolve in a dimension
  *     (violations = orphan rows).
  *
  * Scale posture: ALL row rules plus AT MOST ONE uniqueness rule are
  * evaluated in ONE scan of the fact — row predicates as conditional
  * sums, uniqueness as count−count(distinct) in the same aggregate.
  * NOTE: each additional countDistinct on a different key set forces a
  * Catalyst Expand (one duplicated row per distinct group), so with N
  * unique rules a single aggregate would scan ~N× the rows; we therefore
  * evaluate the 2nd..Nth unique rules as independent single-distinct
  * aggregates (each its own 2-projection scan, run in parallel by the
  * scheduler) rather than widening the shared one. Each FK rule adds one
  * left-anti join against its dimension — broadcast when the dimension is
  * small, shuffle-hash otherwise — never a collect. The report is
  * rule-per-row, so downstream alerting joins on rule_name.
  */
object QualityAudit {

  sealed trait Rule { def name: String }

  /** Every row must satisfy `valid`; a violation is a row where it is
    * false OR null (a null predicate means the rule could not prove the
    * row valid — count it, as Deequ does). */
  final case class RowRule(name: String, valid: Column) extends Rule

  /** `keys` must be unique across the frame. */
  final case class UniqueRule(name: String, keys: Seq[Column]) extends Rule

  /** `keys` must exist in `dimKeys` of `dim` (referential integrity).
    *
    * NULL contract: a fact row whose key is (partly) NULL is NOT an FK
    * violation — it is skipped before the anti-join, matching SQL
    * `NOT EXISTS` (and `NOT IN` when no side is null). Audit nullability
    * separately with a [[RowRule]] (`isnotnull(key)`); this keeps each
    * rule's count single-purpose and the oracle semantics unambiguous.
    * n_checked still counts every fact row. */
  final case class FkRule(name: String, keys: Seq[Column], dim: DataFrame,
                          dimKeys: Seq[Column]) extends Rule

  /** Run the rule suite; returns (rule_name, n_checked, n_violations),
    * one row per rule. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    // One unique rule rides the shared scan for free; 2nd..Nth each get
    // their own single-distinct aggregate (see scale note above).
    val uniqueRules = rules.collect { case r: UniqueRule => r }
    val scanRules = rules.collect {
      case r: RowRule => r.name ->
        sum(when(coalesce(r.valid, lit(false)), 0L).otherwise(1L))
    } ++ uniqueRules.take(1).map { r =>
      r.name -> (count(lit(1)) - countDistinct(r.keys.head, r.keys.tail: _*))
    }
    // lazy: with no scan rules, explode(array()) would fail analysis
    lazy val base = df.agg(count(lit(1)).as("__n"),
      scanRules.map { case (n, c) => c.as(s"__v_$n") }: _*)
    lazy val tall = base.select(col("__n"),
      explode(array(scanRules.map { case (n, _) =>
        struct(lit(n).as("rule_name"), col(s"__v_$n").cast("long").as("v"))
      }: _*)).as("r"))
      .select(col("r.rule_name"), col("__n").cast("long").as("n_checked"),
        col("r.v").as("n_violations"))
    val extraUniques = uniqueRules.drop(1).map { r =>
      df.agg(count(lit(1)).cast("long").as("n_checked"),
          (count(lit(1)) - countDistinct(r.keys.head, r.keys.tail: _*))
            .cast("long").as("n_violations"))
        .select(lit(r.name).as("rule_name"), col("n_checked"),
          col("n_violations"))
    }
    val fkReports = rules.collect { case r: FkRule =>
      val kn = r.keys.indices.map(i => s"__k$i")
      val orphans = df.select(r.keys: _*).toDF(kn: _*)
        // NULL keys are not violations (NOT EXISTS semantics) — see scaladoc
        .na.drop("any", kn)
        .join(r.dim.select(r.dimKeys: _*).toDF(kn: _*), kn.toSeq, "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      df.agg(count(lit(1)).cast("long").as("n_checked"))
        .crossJoin(orphans)
        .select(lit(r.name).as("rule_name"), col("n_checked"),
          col("n_violations").cast("long"))
    }
    val all =
      (if (scanRules.isEmpty) extraUniques ++ fkReports
       else tall +: (extraUniques ++ fkReports))
    if (all.isEmpty) spark.emptyDataFrame
    else all.reduce(_.unionByName(_)).orderBy(col("rule_name"))
  }
}
