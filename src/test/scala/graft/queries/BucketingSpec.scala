package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Co-located joins via bucketing — the 100 TB join strategy the catalog's
  * broadcast joins don't cover: when BOTH sides are fact-sized, bucketing
  * them on the join key at write time removes the shuffle from every
  * subsequent join. This spec proves the plan property (no Exchange over the
  * bucketed scans), not just the result.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, dir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, dir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // both sides scan bucketed files; the join itself requires no Exchange
    // (only the final small aggregation may shuffle)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join should be co-located:\n$plan")
    // and the result is right
    val n = joined.agg(sum("n")).head().getLong(0)
    assert(n == Tables.lineitem(spark, dir).count())
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }
}
