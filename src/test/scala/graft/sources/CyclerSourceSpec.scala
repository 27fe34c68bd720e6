package graft.sources

import graft.SparkSpec
import graft.battery.Normalize

/** The pluggable source must behave exactly like calling Normalize
  * directly, from both the reader API (short name) and SQL USING. */
class CyclerSourceSpec extends SparkSpec {

  private val csv = getClass.getResource("/arbin_small.csv").getPath

  test("format(\"cycler\") loads the canonical time-series") {
    val viaSource = spark.read.format("cycler").option("path", csv).load()
    val direct = Normalize(spark, csv)
    assert(viaSource.schema == direct.schema)
    assert(viaSource.count() == direct.count())
    assert(viaSource.orderBy("row_seq").collect().map(_.toSeq).toSeq ==
      direct.orderBy("row_seq").collect().map(_.toSeq).toSeq)
  }

  test("projection is pruned into the relation (PrunedScan)") {
    val viaSource = spark.read.format("cycler").option("path", csv).load()
    val two = viaSource.select("cycle_index", "voltage_v")
    // the data-source scan node itself must carry only the requested
    // columns — i.e. the prune happened INSIDE buildScan (before external
    // Row conversion), not as a Project above a 10-column scan
    val scans = two.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a RowDataSourceScanExec for the source")
    assert(scans.head.output.map(_.name).toSet == Set("cycle_index", "voltage_v"),
      s"scan materialized ${scans.head.output.map(_.name)}")
    // and values still match the direct path
    val direct = Normalize(spark, csv).select("cycle_index", "voltage_v")
    assert(two.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      direct.collect().map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("filters push into the relation and results stay correct") {
    val viaSource = spark.read.format("cycler").option("path", csv).load()
    val q = viaSource.filter("cycle_index > 1 AND voltage_v IS NOT NULL")
      .select("cycle_index", "voltage_v")
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the scan node must report pushed filters (translation happened)
    assert(scans.head.metadata.getOrElse("PushedFilters", "[]") != "[]",
      s"no filters pushed: ${scans.head.metadata}")
    val direct = Normalize(spark, csv)
      .filter("cycle_index > 1 AND voltage_v IS NOT NULL")
      .select("cycle_index", "voltage_v")
    assert(q.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      direct.collect().map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("SQL: CREATE TABLE ... USING cycler") {
    spark.sql("DROP TABLE IF EXISTS cycler_sql_test")
    spark.sql(
      s"CREATE TABLE cycler_sql_test USING cycler OPTIONS (path '$csv')")
    try {
      val n = spark.sql(
        "SELECT count(*) FROM cycler_sql_test WHERE voltage_v IS NOT NULL")
        .head().getLong(0)
      assert(n > 0)
    } finally spark.sql("DROP TABLE cycler_sql_test")
  }
}
