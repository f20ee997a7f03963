package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry assembling every gate query (SURVEY §2 inventory + training-data
  * ops) with its DuckDB oracle. Conventions: see queries/Parity.scala. */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    queries.RelationalA.queries ++ queries.RelationalB.queries

  def oracle: Map[String, String] =
    queries.RelationalA.oracle ++ queries.RelationalB.oracle
}
