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

  /** Render one id-array column of `log` as "(id,name)" pair strings
    * joined with "; ". `dim` must have columns (id, display_name).
    * Null/empty arrays render as the empty string (the reference stores
    * False — the sink's blank cell). */
  private def render(log: DataFrame, arrayCol: String,
                     dim: DataFrame): DataFrame = {
    val exploded = log
      .select(col("log_id"), col("field"),
        posexplode_outer(col(arrayCol)).as(Seq("pos", "id")))
    exploded
      .join(broadcast(dim), exploded("id") === dim("id"), "left")
      .groupBy(col("log_id"), col("field"))
      .agg(concat_ws("; ",
        transform(
          array_sort(collect_list(struct(col("pos"),
            when(exploded("id").isNull, lit(null))
              .otherwise(concat(lit("("), exploded("id"), lit(","),
                coalesce(dim("display_name"), lit("DELETED")), lit(")")))
              .as("pair")))),
          s => s.getField("pair"))).as(s"${arrayCol}_text"))
  }

  /** `log` columns: log_id, field, old_value (array<long>), new_value
    * (array<long>). Output: log_id, field, old_value_text, new_value_text. */
  def renderPairs(log: DataFrame, dim: DataFrame): DataFrame = {
    val oldR = render(log, "old_value", dim)
    val newR = render(log, "new_value", dim)
    oldR.join(newR, Seq("log_id", "field"))
      .select(col("log_id"), col("field"),
        col("old_value_text"), col("new_value_text"))
  }
}
