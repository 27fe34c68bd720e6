package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  private def labelMap(pairs: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.minLabel(edges(pairs: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain propagates the min id across hops (a-b, b-c, c-d)") {
    assert(labelMap(1L -> 2L, 2L -> 3L, 3L -> 4L) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("min id flows against edge direction too") {
    // min vertex sits at the chain's END as written: 5-4, 4-3 ⇒ all label 3
    assert(labelMap(5L -> 4L, 4L -> 3L) === Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("disjoint components keep separate labels; sizes are per-cluster") {
    val cl = ConnectedComponents
      .clusters(edges(1L -> 2L, 2L -> 3L, 10L -> 11L), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cl === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("star and triangle merge through their hub (transitive closure)") {
    // two pair-families sharing doc 7 collapse into one cluster
    assert(labelMap(7L -> 20L, 7L -> 30L, 20L -> 30L, 7L -> 2L) ===
      Map(2L -> 2L, 7L -> 2L, 20L -> 2L, 30L -> 2L))
  }

  test("duplicate and self edges are harmless") {
    assert(labelMap(1L -> 2L, 1L -> 2L, 2L -> 2L) === Map(1L -> 1L, 2L -> 1L))
  }
}
