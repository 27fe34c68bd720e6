package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling asserted, not assumed: a hot key must be split at
  * runtime (the salting operator j4 is the manual fallback; AQE is the
  * zero-code path this spec proves actually engages).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join and make the local row sizes cross the skew
      // thresholds (tuned for ~250k hot rows at 8-16 B/row)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one pathologically hot key (250k of 300k rows) + a uniform tail
      val fact = spark.range(300000).select(
        when(col("id") < 250000, lit(7L)).otherwise(pmod(col("id"), lit(97L)))
          .as("k"), col("id").as("v"))
      val dim = spark.range(97).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // NOTE: a groupBy(k) directly on the join output would VETO the skew
      // split (the agg requires the join's hash distribution, and AQE will
      // not break a required distribution without forceOptimizeSkewedJoin)
      // — so the skew assertion runs on the bare join
      val j = fact.join(dim, "k").select(col("v"), col("w"))
      // collect() finalizes THIS DataFrame's adaptive execution (a
      // .write spawns a fresh QueryExecution whose plan never runs)
      assert(j.collect().length == 300000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot partition's join as skew-split:\n$finalPlan")
      // correctness unaffected by the split
      val expectedHot = 250000L +
        (250000L until 300000L).count(_ % 97 == 7)
      val hot = fact.join(dim, "k").filter(col("k") === 7L).count()
      assert(hot == expectedHot, s"hot-key count wrong: $hot != $expectedHot")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
