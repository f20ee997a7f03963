package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that keep Spark output bit-identical to the DuckDB oracle.
  *
  * Rules (see .claude/skills/verify/SKILL.md "Gotchas"):
  *  - `fr(c, s)` = floor(c*10^s + 0.5)/10^s — deterministic half-up rounding
  *    built from IEEE ops that evaluate identically in Spark and DuckDB.
  *    Use for PER-ROW rounding (a single divergent row corrupts a whole sum).
  *    SQL side: `floor(x * 1eS + 0.5) / 1eS`.
  *  - `round(agg, 2)` is fine for FINAL aggregates of 2-decimal money data
  *    (sums land ~1e-9 from a multiple of 0.01, far from the .005 boundary).
  *  - dates/timestamps → strings (`date_format` / `strftime`);
  *  - year()/month()/datediff() → cast LONG (DuckDB returns BIGINT);
  *  - aliases all lowercase on both sides.
  */
object Parity {
  def fr(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
}
