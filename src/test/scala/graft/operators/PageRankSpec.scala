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

  test("rounds read the hoisted edge table; exchanges stay bounded") {
    import spark.implicits._
    // Plan pin for the round-6 rewrite (ProfilePR: 8.7 s → 3.5 s at sf0.1):
    // the (src, dst, d) join is hoisted out of the loop and checkpointed
    // once, so each round's eager-checkpoint job must read ONLY
    // checkpointed RDDs — a round plan that re-derives source lineage
    // (here: LocalTableScan) means the hoist regressed. Iteration count is
    // pinned through the checkpoint count: ed + ids + one per round.
    val plans = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += ((funcName, qe.executedPlan.toString)) }
      def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val fwd = (0L until 32L).map(i => (i, (i + 1) % 32))
      val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
      PageRank.ranks(edges, 3).collect()
      // the listener bus is async — wait for the 5 checkpoint events
      val deadline = System.nanoTime() + 30e9.toLong
      def ckpts = plans.synchronized {
        plans.filter(p => p._1.toLowerCase.contains("checkpoint")) }
      while (ckpts.size < 5 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val cp = ckpts
      assert(cp.size == 5,
        s"expected ed + idsF + 3 round checkpoints, saw ${cp.size}: " +
          cp.map(_._1).mkString(","))
      // only ed may touch source lineage: the flagged vertex set derives
      // from the CHECKPOINTED ed (the round-15 regression was exactly this
      // read re-running the caller's edge lineage — +81 s at 100×)
      val sourced = cp.filter(_._2.contains("LocalTableScan"))
      assert(sourced.size <= 2,
        s"round plans must read checkpointed RDDs only:\n" +
          sourced.map(_._2).mkString("\n----\n"))
      // each round: one agg exchange (+ at most a join exchange pair never
      // appears — the rank side broadcasts); a cascade means a lost plan
      val rounds = cp.filterNot(_._2.contains("LocalTableScan"))
      rounds.foreach { case (_, p) =>
        val ex = p.linesIterator.count(
          _.trim.startsWith("Exchange hashpartitioning"))
        assert(ex <= 2, s"round plan grew $ex exchanges:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("directed chain with dangling sink matches the hand-computed fixed point") {
    import spark.implicits._
    // A->B->C, C dangling; vertex set {A,B,C} comes from src UNION dst.
    // Hand-computed integer fixed point, 2 iterations (micro-units,
    // share = dangling_sum div 3 folded into the damping term):
    //   iter1: share=333333; A=433333, B=C=1283333
    //   iter2: share=1283333 div 3=427777;
    //          A=150000+85*427777 div 100=513610
    //          B=150000+85*(433333+427777) div 100=881943
    //          C=150000+85*(1283333+427777) div 100=1604443
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val r = PageRank.ranks(edges, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 513610L, 1L -> 881943L, 2L -> 1604443L), r.toString)
  }

  test("dangling redistribution conserves rank order and keeps symmetric graphs untouched") {
    import spark.implicits._
    // a symmetrized graph has no dangling vertices: the generalization must
    // not change its fixed point (4-cycle invariance re-checked through the
    // directed-capable path)
    val fwd = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val sym = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    assert(PageRank.ranks(sym, 3).collect().forall(_.getLong(1) == 1000000L))
    // directed star INTO a sink: the sink accumulates, sources tie at the
    // teleport-plus-share floor, and the sink's parked mass flows back to
    // everyone (sources rank above bare teleport 150000)
    val sink = (1L to 4L).map(i => (i, 0L)).toDF("src", "dst")
    val rr = PageRank.ranks(sink, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rr.size == 5)
    assert((1L to 4L).map(rr).distinct.size == 1, s"sources must tie: $rr")
    assert(rr(0L) > rr(1L), s"sink must dominate: $rr")
    assert(rr(1L) > 150000L, s"dangling mass must flow back to sources: $rr")
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
