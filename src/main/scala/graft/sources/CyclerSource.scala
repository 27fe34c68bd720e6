package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, PrunedScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.battery.Normalize

/** Pluggable Spark source for vendor cycler CSVs: wires the whole
  * normalization front-end (delimiter probe + pandas-parity fallback,
  * header maps, lenient casts, unit/sign fixes, scan-deterministic
  * row_seq) behind the standard reader API, so any Spark user — SQL,
  * Python, or Scala — can load a canonical time-series without knowing the
  * battery layer:
  *
  * {{{
  * spark.read.format("cycler").option("path", csv).load()
  * // or SQL: CREATE TABLE c USING cycler OPTIONS (path '...')
  * }}}
  *
  * (Short name via DataSourceRegister + META-INF/services; the fully
  * qualified class name works too.)
  *
  * The relation stays declarative: `buildScan` hands Catalyst the
  * normalized plan's RDD and schema; filters compose on top as usual, and
  * requested projections are pushed INTO the normalized plan
  * ([[PrunedScan]]) — a `SELECT two, cols` over the source converts only
  * those columns to external rows instead of materializing all ten
  * canonical columns per row.
  */
class CyclerSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "cycler"
  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft.sources.cycler requires a 'path' option"))
    new CyclerRelation(ctx.sparkSession, path)
  }
}

private[sources] class CyclerRelation(spark: SparkSession, path: String)
    extends BaseRelation with PrunedScan {
  private lazy val df: DataFrame = Normalize(spark, path)
  override def sqlContext: SQLContext = spark.sqlContext
  override def schema: StructType = df.schema
  // prune BEFORE .rdd: the row conversion (the expensive step — external
  // Row allocation outside codegen) then carries only the requested columns
  override def buildScan(requiredColumns: Array[String]): RDD[Row] =
    if (requiredColumns.isEmpty) df.select().rdd
    else df.select(requiredColumns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*).rdd
}
