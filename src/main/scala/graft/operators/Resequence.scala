package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document resequencing (reference
  * etl_account/wizard/account_resequence.py:37-56, applying the base
  * wizard's `new_by_date` values): reassign the EXISTING sequence numbers
  * of each journal's documents to the same documents ordered by
  * (date, name). Numbers are conserved — the set of sequence numbers per
  * journal is unchanged, only which document carries which number moves —
  * which is exactly what makes gapless renumbering auditable.
  *
  * The reference computes the mapping in Python over the browsed
  * recordset and writes names one record at a time. Spark-first: two
  * row_number ranks INSIDE each journal partition (one over the numbers,
  * one over the documents in date order) joined on (journal, rank). The
  * windows are journal-partitioned — a journal's sequence is inherently
  * serial, so per-journal window work is the minimum possible; no global
  * sort exists anywhere in the plan. */
object Resequence {

  /** `moves`: (journal, name, seq long, dt date). Returns one row per
    * document: (journal, old_name, dt, new_seq) where new_seq is the
    * journal's seq set redistributed in (dt, name) order. Determinism
    * contract: `name` must be unique within a journal (document serials
    * are) — it is the (dt, name) tiebreaker, the same total order the
    * reference's `order='date,name'` search uses. */
  def byDate(moves: DataFrame): DataFrame = {
    val byNum = moves.select(col("journal"), col("seq").as("new_seq"))
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("journal")).orderBy(col("new_seq"))))
    val byDt = moves
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("journal"))
          .orderBy(col("dt"), col("name"))))
    byDt.join(byNum, Seq("journal", "rk"))
      .select(col("journal"), col("name").as("old_name"), col("dt"),
        col("new_seq"))
  }
}
