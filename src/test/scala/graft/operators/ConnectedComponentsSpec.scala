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

  test("adversarial 10^4-vertex path converges in O(log n) rounds") {
    import spark.implicits._
    val n = 10000
    // path graph 0-1-2-…-n-1: worst case for pure one-hop min propagation
    // (O(n) rounds); pointer doubling must finish in ~log2(n) ≈ 13 + c
    val path = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = ConnectedComponents
      .minLabelWithRounds(path, "a", "b", maxIter = 24)
    val agg = labels.agg(count(lit(1)), max("label"), min("label"))
      .collect()(0)
    assert(agg.getLong(0) === n.toLong, "every vertex labeled")
    assert(agg.getLong(1) === 0L && agg.getLong(2) === 0L,
      "single component with min-id label 0")
    assert(rounds <= 18, s"expected O(log n) rounds, got $rounds")
  }

  private def mergedMap(prev: Seq[(Long, Long)],
                        delta: Seq[(Long, Long)]): Map[Long, Long] = {
    val labeling = ConnectedComponents.minLabel(edges(prev: _*), "a", "b")
      .select(col("id"), col("label").as("cluster_id"))
    ConnectedComponents.mergeNewPairs(labeling, edges(delta: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("mergeNewPairs == from-scratch CC on the union (identity)") {
    // bridges two old clusters, extends one, and brings brand-new vertices
    val prev = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L)
    val delta = Seq(3L -> 10L, 21L -> 22L, 50L -> 51L)
    assert(mergedMap(prev, delta) === labelMap((prev ++ delta): _*))
  }

  test("mergeNewPairs with no affected roots leaves the labeling unchanged") {
    val prev = Seq(1L -> 2L, 10L -> 11L)
    // delta joins only brand-new vertices — old clusters untouched
    assert(mergedMap(prev, Seq(100L -> 101L)) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 100L -> 100L, 101L -> 100L))
  }

  test("mergeNewPairs chains THROUGH the batch (old-new-old bridging)") {
    // two old clusters connected only via a brand-new middle vertex:
    // the root graph must chain 1←100←10, not just re-root pairwise
    val prev = Seq(1L -> 2L, 10L -> 11L)
    val delta = Seq(2L -> 100L, 100L -> 10L)
    assert(mergedMap(prev, delta) === labelMap((prev ++ delta): _*))
  }

  test("mergeNewPairs keeps the min-id invariant when the batch holds the min") {
    // the new vertex 0 becomes the merged cluster's root
    val prev = Seq(5L -> 6L)
    val delta = Seq(0L -> 5L)
    assert(mergedMap(prev, delta) === Map(0L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("mergeNewPairs absorbs a 1000-link batch chain threading old clusters") {
    // adversarial merge: 500 old 2-vertex clusters daisy-chained by a batch
    // path (old(2k,2k+1) — new(10000+k) — old(2k+2,…)): the root graph is a
    // long path, exactly what the merge's pointer-doubled CC must collapse
    val prev = (0L until 500L).flatMap(k => Seq(2 * k -> (2 * k + 1)))
    val delta = (0L until 499L).flatMap(k =>
      Seq((2 * k + 1) -> (10000 + k), (10000 + k) -> (2 * k + 2)))
    val merged = mergedMap(prev, delta)
    assert(merged.size === 1499, "1000 old + 499 bridge vertices")
    assert(merged.values.forall(_ == 0L), "one component rooted at 0")
  }
}
