package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Auditlog relational value rendering (reference
  * auditlog/models/rule.py:626-659 `_prepare_log_line_vals_on_write`):
  * a *2many field's old/new values are arrays of ids; the log line stores
  * them rendered as (id, display_name) pairs via `name_get()`, and ids
  * that no longer resolve in the target model are rendered as
  * (id, "DELETED") (rule.py:650-653 filters existing ids first and appends
  * the DELETED pairs for the difference).
  *
  * The reference resolves names row-by-row with per-record browse() calls.
  * Spark-first: posexplode each id array (position kept so the rendered
  * list preserves the stored id order), ONE left join against the display
  * dim for the whole log batch, coalesce missing names to "DELETED", and
  * re-aggregate sorted by position — two joins total (old + new) regardless
  * of log size, broadcast when the dim is small.
  */
object AuditRender {

  /** `log` columns: log_id, field, old_value (array<long>), new_value
    * (array<long>). Output: log_id, field, old_value_text, new_value_text
    * — each side rendered as "(id,name)" pairs joined with "; " in stored
    * order; null/empty arrays render as the empty string (the reference
    * stores False — the sink's blank cell).
    *
    * Both sides are tagged into ONE exploded stream, so the whole render
    * is one scan of the log, one broadcast join against the dim, and one
    * aggregation — not two explode+join pipelines merged by a third join. */
  def renderPairs(log: DataFrame, dim: DataFrame): DataFrame = {
    def tag(arrayCol: String, side: Int): Column =
      transform(coalesce(col(arrayCol), array().cast("array<long>")),
        (x, i) => struct(lit(side).as("side"), i.as("pos"), x.as("id")))
    val tagged = log
      .select(col("log_id"), col("field"),
        explode_outer(concat(tag("old_value", 0), tag("new_value", 1))).as("e"))
      .select(col("log_id"), col("field"),
        col("e.side").as("side"), col("e.pos").as("pos"), col("e.id").as("id"))
    val joined = tagged.join(
      broadcast(dim.select(col("id").as("__did"),
        col("display_name").as("__dn"))),
      tagged("id") === col("__did"), "left")
    def sideText(side: Int): Column = concat_ws("; ",
      transform(
        array_sort(collect_list(when(col("side") === side,
          struct(col("pos"),
            concat(lit("("), col("id"), lit(","),
              coalesce(col("__dn"), lit("DELETED")), lit(")")).as("pair"))))),
        s => s.getField("pair")))
    joined
      .groupBy(col("log_id"), col("field"))
      .agg(sideText(0).as("old_value_text"), sideText(1).as("new_value_text"))
  }
}
