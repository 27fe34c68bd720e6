package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The HLL sketch path must estimate within its error envelope and be
  * partitioning-invariant (register merges are order-insensitive — the
  * property that makes the sketch safe under any shuffle layout). */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("hll estimate within 5% of exact and stable under repartitioning") {
    val base = QueryCatalog.queries("a11_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(base.nonEmpty)
    for ((et, (approx, exact)) <- base) {
      assert(exact > 0)
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$et: approx=$approx exact=$exact")
    }
    val shuffled = graft.Tables.events(spark, dir).repartition(7, col("event_id"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((et, (approx, _)) <- base)
      assert(shuffled(et) == approx, s"$et: estimate changed under repartition")
  }
}
