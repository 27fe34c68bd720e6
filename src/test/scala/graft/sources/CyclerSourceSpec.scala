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
