package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level MERGE (upsert/delete) — the reference's bulk data-repair jobs
  * (`etl_stock/models/company.py:657-890` `upload_ob_rec`,
  * `upload_vendor_payable`) re-upload corrected rows and overwrite matches
  * one ORM write at a time. Spark-first this is a single full-outer join
  * on the key: matched rows take the incoming version, unmatched keep the
  * base, tombstones delete — Delta's MERGE INTO semantics without the
  * dependency. One shuffle on the key; both sides stream. */
object Upsert {

  /** Merge `updates` into `base` on `keyCol`. Rows in `updates` with
    * `deleteCol` true are tombstones: the key disappears. Column sets must
    * match. Contract (same as Delta MERGE): at most ONE update row per key
    * — a batch with duplicate keys must be pre-deduplicated (e.g. keep the
    * latest by version), otherwise the join fans out. */
  def merge(base: DataFrame, updates: DataFrame, keyCol: String,
            deleteCol: String): DataFrame = {
    val dataCols = base.columns.filter(_ != keyCol).toSeq
    require(updates.columns.toSet == base.columns.toSet + deleteCol,
      s"updates must carry base columns + $deleteCol")
    val b = base.select(col(keyCol).as("__bk") +:
      dataCols.map(c => col(c).as(s"__b_$c")): _*)
    val u = updates.select(col(keyCol).as("__uk") +: col(deleteCol).as("__del") +:
      dataCols.map(c => col(c).as(s"__u_$c")): _*)
    b.join(u, col("__bk") === col("__uk"), "full_outer")
      .filter(!coalesce(col("__del"), lit(false)))
      .select(coalesce(col("__uk"), col("__bk")).as(keyCol) +:
        dataCols.map(c =>
          when(col("__uk").isNotNull, col(s"__u_$c"))
            .otherwise(col(s"__b_$c")).as(c)): _*)
  }
}
