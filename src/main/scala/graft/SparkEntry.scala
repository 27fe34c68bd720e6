package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.OrderedOps
import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's per-cycle feature DAG phrased over the driver
    * testdata (user ≙ cell/cycle, value ≙ signal): ordered-last + trapezoidal
    * integral + OLS fit, assembled with key-partitioned joins — the same
    * shape as `pipeline.py` normalize → features → merge → summary.
    * Driver smoke-checks rows > 0 on /root/testdata/sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val ord = Seq(col("ts"), col("event_id"))
    val last = OrderedOps.lastNonNull(ev, Seq("user_id"), "value", ord, "last_value")
    val trapz = OrderedOps.trapezoid(ev, Seq("user_id"), "value",
      expr("ts div 1000") / lit(3600e6), ord, "e_trapz")
    val fit = OrderedOps.olsFit(ev, Seq("user_id"), col("value"),
      expr("ts div 1000") / lit(3600e6), crossAt = 150.0)
    last.join(trapz, Seq("user_id"), "left")
      .join(fit, Seq("user_id"), "left")
      .orderBy("user_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
