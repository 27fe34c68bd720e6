package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full operator catalog: every SURVEY.md §2 operator (and the §2b
  * extended surface) expressed as a named query over the driver testdata,
  * with DuckDB oracle SQL wherever the semantics are SQL-expressible.
  */
object QueryCatalog {

  def all: Seq[QueryDef] =
    EventOps.defs ++ RelationalOps.defs ++ TextOps.defs ++ VectorOps.defs ++
      StreamShaped.defs ++ AnalyticsOps.defs ++ MultimodalOps.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.query).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator
      .map(_.trim).mkString(" ").trim)).toMap
}
