package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry assembling every gate query (SURVEY §2 inventory + training-data
  * ops) with its DuckDB oracle. Conventions: see queries/Parity.scala.
  *
  * Gate-runner contract: `all(name)(spark, dir)` normally returns a LAZY
  * DataFrame (no jobs until an action), but a few gates execute bounded
  * Spark work at CONSTRUCTION time, by documented design:
  *   - q142/q144/q146/q147/q148/q151 (SelectionOps) collect driver-bounded
  *     artifacts (Bloom positions ≤ m, ≤k coreset centers, PQ codebooks)
  *     or write a scratch fixture before returning the plan;
  *   - q106/q129 write ≤25-row scratch fixtures under `Scratch.fresh`;
  *   - q157/q159/q160/q161/q163/q164/q167/q168 run bounded Structured
  *     Streaming queries (4–6 micro-batches over bounded samples) and
  *     return the persisted sink; q165 runs the q159 query TWICE (stop
  *     after 2 batches, resume from the checkpoint) to gate recovery;
  *   - q166 runs bounded scalar aggregates plus one capped pair join over
  *     the skewed fixture (caches released via the builder's thunk);
  *   - q170 collects the cash-flow statement's 17 section totals
  *     driver-side (the layout roll-up contract of
  *     [[graft.report.CashFlowStatement]]);
  *   - q174 collects the tax-totals footer (bounded by the tax-group
  *     dim) driver-side — the layout contract of
  *     [[graft.report.TaxTotals]];
  *   - gates that consume the suite-level dedup-index memos — exact
  *     pairs, CC clusters, MinHash candidates ([[graft.queries.PairMemo]])
  *     — materialize the shared artifact on FIRST construction per
  *     (JVM, data dir).
  * Callers that only want the plan (e.g. plan audits) therefore run real
  * (bounded) jobs for these names — acceptable at test scale, and the
  * artifacts are keyed so repeated construction reuses them. */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    queries.RelationalA.queries ++ queries.RelationalB.queries ++
      queries.DedupOps.queries ++ queries.TextOps.queries ++
      queries.SimilarityOps.queries ++ queries.EngineOps.queries ++
      queries.ReportOps.queries ++ queries.GateOps.queries ++
      queries.StockOps.queries ++ queries.SketchOps.queries ++
      queries.CurationOps.queries ++ queries.WizardOps.queries ++
      queries.SelectionOps.queries

  def oracle: Map[String, String] =
    queries.RelationalA.oracle ++ queries.RelationalB.oracle ++
      queries.DedupOps.oracle ++ queries.TextOps.oracle ++
      queries.SimilarityOps.oracle ++ queries.EngineOps.oracle ++
      queries.ReportOps.oracle ++ queries.GateOps.oracle ++
      queries.StockOps.oracle ++ queries.SketchOps.oracle ++
      queries.CurationOps.oracle ++ queries.WizardOps.oracle ++
      queries.SelectionOps.oracle
}
