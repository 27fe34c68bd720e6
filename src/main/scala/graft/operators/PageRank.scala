package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: the iterative-graph-compute operator (link/hub
  * analysis over entity graphs), phrased for reproducibility at scale.
  *
  * Ranks are integer MICRO-units and every step is integer arithmetic —
  * per-edge contribution `rank div out_degree` (integer division), damping
  * `(85 · Σcontrib) div 100` — so the result is bit-identical under any
  * partitioning, join order, or engine (the same reasoning as the catalog's
  * micro-quantized NLL sums; floating-point PageRank diverges in the last
  * ulp between partial-agg orders). This is deliberately the deterministic
  * fixed-point variant real reproducible pipelines run, not a float port.
  *
  * Scale shape: one join of edges→ranks per iteration, hash-keyed on `src`
  * (edges and degrees co-partition and REUSE the same exchange across
  * iterations since the key never changes), partial-agged sum per `dst`.
  * Per-round `localCheckpoint` (as in [[ConnectedComponents]]) truncates
  * lineage for long runs; at 3 rounds the plain plan is cheaper.
  *
  * The vertex set is src ∪ dst, so DIRECTED graphs work unmodified:
  * dangling vertices (no out-edges — a dst that never appears as src) are
  * detected once (an iteration-invariant anti-join) and their rank mass is
  * redistributed uniformly each round — one scalar aggregate per round
  * (`Σ rank over dangling vertices div |V|`, integer) added inside the
  * damping term, the standard dangling-mass treatment. Symmetrized edge
  * sets have no dangling vertices, detect that in the same up-front count,
  * and skip the per-round aggregate entirely. The rank vector is rebuilt
  * each round from the FULL vertex set (left join against summed
  * contributions): a vertex with out-edges but no in-edges keeps the
  * teleport mass instead of vanishing from `r` — which would silently drop
  * its outbound contributions in every later round.
  */
object PageRank {

  /** @param edges two columns `src`, `dst` (directed; symmetrize for
    *              undirected semantics).
    * @return (id, rank) with rank in micro-units (1.0 ≡ 1,000,000). */
  def ranks(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1)
    // when the SOURCE bytes say the edge table will checkpoint fat (the
    // 100× OOM class, operators/Ckpt.scala), widen the layout HERE, keyed
    // on src: this repartition REPLACES the degree-agg and degree-join
    // shuffles (both consume hash(src)) and the checkpoint inherits the
    // bounded blocks, so the per-round join keeps its reusable exchange —
    // measured at 100×: 66 s vs 159 s for a round-robin re-layout that
    // forced a full edge reshuffle every round
    val wide = Ckpt.partitionsFor(Ckpt.sourceBytes(edges))
    val eIn = if (wide > 0) edges.repartition(wide, col("src")) else edges
    val deg = eIn.groupBy("src").agg(count(lit(1)).as("d"))
    // The per-edge (src, dst, d) table is ITERATION-INVARIANT: materialize
    // it ONCE (localCheckpoint) so every round is a single join (edge table
    // ⋈ ranks) + one partial-agged sum, instead of re-deriving the whole
    // upstream edge lineage (for g1: pair-join + distinct + union) each
    // round. Round-5 shipped the no-checkpoint form on a 2.87 s in-session
    // measurement; the driver bench read it at 10.84 s. Isolated re-measure
    // (ProfilePR, round 6, sf0.1, min of 2): plain 5.3–8.7 s, hoisted 4.6 s,
    // hoisted + per-round rank checkpoint 3.5 s — the hoisted/checkpointed
    // form wins in every rep and is what ships. All four variants are
    // bit-identical (integer fixed-point; ProfilePR cross-checks).
    // SHUFFLE_HASH on the slim side, here and in the per-round join below:
    // the edge side of both joins has power-law per-key fan-out (a hot
    // vertex's whole edge group), and a sort-merge join sort-buffers that
    // group per task — at 40× the 10× fixture (supplier key space fixed, so
    // degrees grow with the data) that buffering OOMed a 250 MB/task local
    // heap share. A shuffled hash join builds on the ONE-ROW-PER-VERTEX
    // side (bounded by |V|/numPartitions, uniform under hash partitioning —
    // vertex COUNT, not edge fan-out) and streams the skewed edge side, so
    // per-task memory is independent of the hottest vertex's degree.
    val ed = Ckpt.bounded(eIn.join(deg.hint("shuffle_hash"), "src")
      .select(col("src"), col("dst"), col("d")))
    // vertex set = src ∪ dst (dst-only vertices — dangling — must hold
    // rank), with the has-out-edges flag computed in the SAME pass: one
    // union + max-agg over the CHECKPOINTED ed (map-side combine collapses
    // the 2|E| rows to ~|V| per partition before the shuffle). Deriving
    // this from the raw edge input instead re-runs the caller's whole edge
    // lineage (for g1: pair-join + distinct + union) — measured at 100×:
    // +81 s on the broadcast leg (229 s vs the r14 pin's 147.9) before
    // this read was repointed at ed.
    val idsF = Ckpt.bounded(
      ed.select(col("src").as("vid"), lit(1).as("out"))
        .union(ed.select(col("dst").as("vid"), lit(0).as("out")))
        .groupBy("vid").agg(max(col("out")).as("has_out")))
    val ids = idsF.select("vid")
    // ONE cheap job over the checkpointed vertex set decides the per-round
    // join strategy. The rank table is one row per VERTEX — orders of
    // magnitude slimmer than the edge table — so up to millions of
    // vertices it broadcasts (~16 bytes a row): the per-round join then
    // needs NO exchange on either side and ONE shared build map per
    // executor, where the shuffled hash join built a per-TASK map 32×
    // over and re-read the edge exchange every round — at the 100× probe
    // (1.5 M vertices, 120 M edges) the 32 concurrent build maps plus the
    // partial-agg tables were exactly what pushed the 8 GB protocol heap
    // over the edge. Past the broadcast bound (vertex count ~billions at
    // 100 TB) the shuffled hash join takes over: build bounded by
    // |V|/partitions, stream the skewed edge side, per-task memory
    // independent of the hottest vertex's degree.
    //
    // Heap budget for the limit: a superseded round's broadcast is only
    // reclaimed after the ContextCleaner processes its weak reference,
    // which needs a driver GC first — so near the limit, plan for 2-3 rank
    // broadcast GENERATIONS resident at once, not one. Round-17 A/B pins
    // at the 100× probe (1.5 M vertices, 8 GB protocol heap) measured what
    // that does to a heap without headroom: the broadcast leg DEGRADES
    // monotonically across same-JVM reps (131 → 133 → 175 s) as the
    // resident generations churn the old gen — the recurring "g1 flags as
    // sweep outlier, self-corrects on a drained re-rep" pattern — while
    // shuffle-hash holds stable and wins the warm min (129 → 111 → 105 s).
    // With 12 GB the broadcast leg is stable and fastest (98 s), so the
    // limit is a HEAP budget, not a plan preference: the default keeps
    // broadcast for vertex sets that fit comfortably (~2-3 resident
    // generations ≤ a few hundred MB) and hands larger graphs to the
    // shuffled hash join, whose per-task memory is independent of both
    // vertex count and the hottest vertex's degree. Deployments with
    // executor-memory headroom raise it via
    // spark.graft.pagerank.broadcastVertexLimit (0 forces shuffle-hash —
    // also the A/B seam the perf probes use).
    val nV = ids.count()
    val BroadcastVertexLimit = edges.sparkSession.conf
      .get("spark.graft.pagerank.broadcastVertexLimit", "1000000").toLong
    def rankSide(r: DataFrame): DataFrame =
      if (nV <= BroadcastVertexLimit) broadcast(r) else r.hint("shuffle_hash")
    // dangling vertices (has_out = 0) are ITERATION-INVARIANT — a filter
    // over the checkpointed flagged vertex set, no further shuffle. A
    // symmetrized graph finds zero in this count and pays nothing per
    // round.
    val dang = idsF.filter(col("has_out") === 0).select("vid")
    val nDang = dang.count()
    val dangSide = if (nDang <= BroadcastVertexLimit) broadcast(dang) else dang
    var r = ids.select(col("vid").as("id"), lit(1000000L).as("rank"))
    // superseded per-round checkpoints are RELEASED as soon as the next
    // round's snapshot exists — otherwise every run pins (iterations + 2)
    // block sets for the lifetime of the session, and on a long-running
    // cluster the block store fills with dead rank tables (the same
    // bounded-footprint rule as the streaming state snapshots)
    var prevCkpt: DataFrame = null
    for (_ <- 1 to iterations) {
      // dangling mass: rank parked on out-edge-less vertices re-enters the
      // damping term as a uniform per-vertex share. One SCALAR aggregate
      // per round (a semi-join against the bounded dangling set, summed) —
      // deterministic (full integer sum, order-free) and skipped outright
      // on graphs with no dangling vertices.
      val dangShare: Long =
        if (nDang == 0L) 0L
        else r.join(dangSide.select(col("vid").as("id")), Seq("id"),
            "left_semi")
          .agg(coalesce(sum("rank"), lit(0L))).first().getLong(0) / nV
      val contrib = ed.join(rankSide(r), col("src") === col("id"))
        // div, not / — Spark's / on longs silently returns double
        .select(col("dst"), expr("rank div d").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("s"))
      // rebuild from the vertex set, not the in-neighbor set: src-only
      // vertices default to the bare teleport mass rather than disappearing.
      // Per-round checkpoint keeps the plan O(1) deep (CC's pattern) —
      // measured faster than lineage growth even at 3 rounds (3.5 vs 4.6 s).
      r = ids.select(col("vid").as("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(150000L) +
            expr(s"(85 * (coalesce(s, 0L) + ${dangShare}L)) div 100"))
            .as("rank"))
      r = Ckpt.bounded(r)
      if (prevCkpt != null) prevCkpt.unpersist()
      prevCkpt = r
    }
    // the returned r is its own checkpoint; the iteration-invariant tables
    // are dead once the loop ends
    ed.unpersist()
    idsF.unpersist()
    r
  }
}
