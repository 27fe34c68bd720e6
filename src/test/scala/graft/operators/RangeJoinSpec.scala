package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The chunk-bucketed range join must equal the naive theta join for any
  * chunk width — including chunks far narrower and far wider than the
  * intervals (replication vs residual-filter extremes). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the theta join at any chunk width") {
    val facts = Seq(0L, 5L, 9L, 10L, 15L, 99L, 100L, 150L, 205L)
      .toDF("p").withColumn("fid", monotonically_increasing_id())
    val intervals = Seq((1L, 0L, 10L), (2L, 9L, 16L), (3L, 100L, 101L),
      (4L, 190L, 300L)).toDF("iv", "s", "e")
    val naive = facts.join(intervals, col("p") >= col("s") && col("p") < col("e"))
      .select("fid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (chunk <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.bucketed(facts, intervals, "p", "s", "e", chunk)
        .select("fid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"chunk=$chunk diverged")
    }
  }
}
