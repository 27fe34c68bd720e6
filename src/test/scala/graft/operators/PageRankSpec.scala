package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank invariants on hand-built graphs. */
class PageRankSpec extends SparkSpec {

  test("symmetric cycle: every vertex keeps exactly the uniform rank") {
    import spark.implicits._
    // 4-cycle, symmetrized: deg=2 everywhere, contribution flow is uniform,
    // so the exact fixed point 1e6 is preserved by every iteration:
    // 150000 + 85 * (2 * 500000) / 100 = 1000000
    val fwd = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val r = PageRank.ranks(edges, 4).collect()
    assert(r.length == 4)
    assert(r.forall(_.getLong(1) == 1000000L), r.mkString(","))
  }

  test("star: the hub outranks the spokes; spokes stay symmetric") {
    import spark.implicits._
    val spokes = (1L to 5L).map(i => (0L, i))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val r = PageRank.ranks(edges, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 6)
    val spokeRanks = (1L to 5L).map(r)
    assert(spokeRanks.distinct.size == 1, s"spokes must tie: $r")
    assert(r(0L) > spokeRanks.head, s"hub must dominate: $r")
    // damping floor: nothing ranks below the 0.15 teleport mass
    assert(r.values.forall(_ >= 150000L))
  }
}
