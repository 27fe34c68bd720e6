package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
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
  * normalized plan's RDD and schema, and both requested projections and
  * the translatable filters are pushed INTO the normalized plan
  * ([[PrunedFilteredScan]]) — a `SELECT two, cols WHERE cycle > 5` over
  * the source filters and prunes before external-Row conversion instead
  * of materializing all ten canonical columns for every row. Filter
  * pushdown here is purely an optimization: Spark re-applies every
  * pushed predicate above the scan (unhandledFilters defaults to all),
  * so a partially-translated conjunction can never change results.
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
    extends BaseRelation with PrunedFilteredScan {
  private lazy val df: DataFrame = Normalize(spark, path)
  override def sqlContext: SQLContext = spark.sqlContext
  override def schema: StructType = df.schema
  // filter then prune BEFORE .rdd: the row conversion (the expensive step —
  // external Row allocation outside codegen) then runs only on surviving
  // rows and carries only the requested columns
  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(translate).foldLeft(df)(_.filter(_))
    val pruned =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.toIndexedSeq.map(col): _*)
    pruned.rdd
  }

  /** Best-effort data-source→Column predicate translation; None for shapes
    * we don't push (Spark re-applies them above the scan regardless). */
  private def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
