package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed-table co-located join — the 100 TB fact⋈fact posture: when both
  * sides are written bucketed on the join key, the join reads pre-hashed
  * files and plans NO exchange on either side (shuffle cost paid once at
  * write time, amortized over every subsequent join/agg on the key). This is
  * the storage-layout complement to j4's salting and e8_zorder's clustering:
  * salting fixes skew inside a shuffle, z-order fixes file pruning,
  * bucketing removes the shuffle entirely.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key plans no exchange and matches the shuffle join") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val items = Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")

      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable("orders_b")
      items.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").mode("overwrite")
        .saveAsTable("lineitem_b")

      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))

      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
        !p.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle either side on the key:\n$p")

      // same result as the plain shuffle join over the raw parquet
      val want = orders.join(items, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
