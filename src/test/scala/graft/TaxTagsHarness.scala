package graft

import org.apache.spark.sql.SparkSession
import graft.engine.TaxTags

/** Shared golden-spec harness for [[TaxTags.evaluate]]: turns literal
  * (amount, invert, tags) fixture rows into the facts/bridge/tag-dim
  * triple the engine takes and collects the unsigned-tag totals, rounded
  * to cents, defaulting absent tags to 0.0 — the one block every
  * tax-matrix transcription needs (it used to be copy-pasted per spec).
  */
object TaxTagsHarness {

  def gridTotals(spark: SparkSession,
                 rows: Seq[(Double, Boolean, Seq[String])]): Map[String, Double] = {
    import spark.implicits._
    val indexed = rows.zipWithIndex
      .map { case ((amt, inv, tags), i) => (i.toLong, amt, inv, tags) }
    val facts = indexed.map(r => (r._1, r._2, r._3))
      .toDF("fact_id", "amount", "tax_tag_invert")
    val tagNames = indexed.flatMap(_._4).distinct
    val tags = tagNames.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("tag_id", "tag_name")
    val tagId = tagNames.zipWithIndex.toMap
    val bridge = indexed.flatMap(r => r._4.map(t => (r._1, tagId(t).toLong)))
      .toDF("fact_id", "tag_id")
    TaxTags.evaluate(facts, bridge, tags)
      .collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 100 + 0.5) / 100)
      .toMap.withDefaultValue(0.0)
  }
}
