package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CardinalityStatsSpec extends SparkSpec {

  test("prefers plan statistics; the fallback is not evaluated on a stats hit") {
    // Range is the simplest plan that carries an exact rowCount statistic
    var fallbackRuns = 0
    val n = CardinalityStats.rowCount(spark.range(4242).toDF("id")) {
      fallbackRuns += 1; -1L
    }
    assert(n == 4242L, s"plan statistic not used: $n")
    assert(fallbackRuns == 0, "fallback must stay unevaluated on a stats hit")
  }

  test("falls back to the caller's count on a stats-less file scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cardstats").toString + "/t"
    spark.range(123).toDF("id").write.parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.queryExecution.optimizedPlan.stats.rowCount.isEmpty,
      "fixture invalid: a bare file scan should carry no rowCount statistic")
    var fallbackRuns = 0
    val n = CardinalityStats.rowCount(df) { fallbackRuns += 1; df.count() }
    assert(n == 123L && fallbackRuns == 1)
  }

  test("reads an ANALYZE'd catalog table's statistic without a job") {
    // the deployment path: the dimension lives in the catalog, ANALYZE
    // maintains its stats, and plan-stats propagation hands Catalyst (and
    // this helper) the row count with zero scan jobs
    val prev = spark.conf.getOption("spark.sql.cbo.planStats.enabled")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      spark.range(77).toDF("id").write.mode("overwrite")
        .saveAsTable("graft_cardstats_dim")
      spark.sql("ANALYZE TABLE graft_cardstats_dim COMPUTE STATISTICS")
      val n = CardinalityStats.rowCount(spark.table("graft_cardstats_dim")) {
        fail("fallback must not run for an ANALYZE'd catalog table"); -1L
      }
      assert(n == 77L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cardstats_dim")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.planStats.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.planStats.enabled")
      }
    }
  }

  test("supplierCount (the g2 routing statistic) still reports the dimension size") {
    val dir = "/root/testdata/sf0.001"
    val n = graft.queries.AnalyticsOps.supplierCount(spark, dir)
    assert(n == graft.Tables.supplier(spark, dir).count(),
      "routing statistic diverged from the dimension row count")
  }
}
