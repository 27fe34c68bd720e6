package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the driver testdata plus (usually) an
  * equivalent DuckDB SQL oracle. `oracle = None` marks operators whose
  * semantics are not SQL-expressible (hash-dependent sketches, streaming-only
  * behaviors) — the driver then records a weaker rows-only check and the
  * ScalaTest suite carries the semantic verification instead.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])
