package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry assembling every gate query (SURVEY §2 inventory + training-data
  * ops) with its DuckDB oracle. Conventions: see queries/Parity.scala. */
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
