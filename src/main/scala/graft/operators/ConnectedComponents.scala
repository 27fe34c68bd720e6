package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the transitive-closure
  * step a dedup pipeline needs on top of pair finding: near-dup PAIRS (from
  * MinHash/LSH banding, SimHash, or exact Jaccard) chain into CLUSTERS
  * (a~b, b~c ⇒ {a,b,c}), and the keeper rule ("keep the min-id doc per
  * cluster") must act on the cluster, not the pair, or chained duplicates
  * survive. The reference has no graph step (its dedup is single-table
  * `drop_duplicates`, /root/reference/pipeline.py:107); this is the
  * corpus-scale generalization.
  *
  * Algorithm: iterative min-label propagation to a fixpoint.
  * `label(v) ← min(label(v), min over neighbors' labels)`, repeated until no
  * label changes. Each round is ONE shuffle (a groupBy on the destination
  * id); lineage is truncated per round with `localCheckpoint` so the plan
  * stays O(1) deep regardless of iteration count — without it the plan
  * doubles per round and Catalyst analysis time explodes by round ~10.
  *
  * 100 TB posture: each round combines one-hop neighbor-min propagation
  * with POINTER DOUBLING (`label(v) ← label(label(v))`, one self-join of
  * the label table) — the label forest's height halves every round, so
  * convergence is O(log diameter) even on adversarial long chains (a
  * 10⁴-vertex path converges in ~15 rounds, pinned by
  * ConnectedComponentsSpec), while star-like near-dup families still finish
  * in 2-3. The state that shuffles is (id, label) — two longs per vertex in
  * the PAIR GRAPH (docs that matched at least one other doc), typically
  * orders of magnitude smaller than the corpus.
  */
object ConnectedComponents {

  /** Min-id component label per vertex of the undirected graph given by
    * `(src, dst)` pairs. Returns `(id, label)` — `label` = the smallest
    * vertex id in the component. Deterministic: the fixpoint is unique.
    *
    * @param maxIter hard cap on propagation rounds (safety valve — the loop
    *                exits early the first round nothing changes)
    */
  def minLabel(edges: DataFrame, src: String, dst: String,
               maxIter: Int = 25): DataFrame =
    minLabelWithRounds(edges, src, dst, maxIter)._1

  /** [[minLabel]] plus the number of propagation rounds executed — the
    * observable the O(log diameter) convergence guarantee is tested on. */
  def minLabelWithRounds(edges: DataFrame, src: String, dst: String,
                         maxIter: Int = 25): (DataFrame, Int) = {
    // materialize the (possibly expensive) edge pipeline ONCE before
    // mirroring: a union of two selects over the same subtree executes that
    // subtree twice — for a pair-finding input that doubles the dominant cost
    // Ckpt.bounded with a source-bytes hint: the edge table is DATA-sized
    // and re-read every round — fat serialized blocks re-inflate whole per
    // task on re-read, the 100× OOM class (operators/Ckpt.scala)
    val e = Ckpt.bounded(edges.select(col(src).as("a"), col(dst).as("b")),
      sizeHintBytes = Ckpt.sourceBytes(edges))
    // both directions, so "neighbor min" sees the full undirected adjacency
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    // vertex init fused with round 1: label₀ = min(id, min neighbor) costs
    // the same shuffle a plain distinct-vertices init would, but already
    // carries labels one hop
    var labels = Ckpt.bounded(sym.groupBy(col("a").as("id"))
      .agg(min(col("b")).as("nbr_min"))
      .select(col("id"), least(col("id"), col("nbr_min")).as("label")))
    // the checkpoint backing the CURRENT labels; superseded snapshots are
    // released per round (and the mirrored edge table at exit) so a run
    // pins exactly one label table, not one per round — on a long-running
    // cluster the leaked snapshots otherwise accumulate until eviction
    // churn taxes every later job in the session
    var labelsCkpt = labels
    var it = 1
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      // SHUFFLE_HASH on the one-row-per-vertex label side (PageRank's
      // round-9 fix, operators/PageRank.scala): a sort-merge join would
      // sort-buffer a hot vertex's whole adjacency group per task, so task
      // memory would grow with the hottest degree; the hash build side is
      // bounded by |V|/numPartitions instead and the skewed edge side
      // streams. The pointer-doubling join below keeps SMJ: its buffered
      // side is one row per key by construction.
      val nbrMin = sym.join(labels.hint("shuffle_hash"),
          sym("a") === labels("id"))
        .groupBy(col("b").as("nid"))
        .agg(min("label").as("nbr_min"))
      val prop = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("lab1"))
      // pointer doubling: labels are themselves vertex ids, so one
      // label-table self-join reads label(label(v)) and the label forest's
      // height halves — O(diameter) rounds become O(log diameter) on
      // chains, at the cost of one extra (small, (id,label)-sized) join
      // per round
      val byId = prop.select(col("id").as("pid"), col("lab1").as("plab"))
      val next = Ckpt.bounded(
        prop.join(byId, prop("lab1") === byId("pid"), "left")
          .select(col("id"), col("old"),
            least(col("lab1"), coalesce(col("plab"), col("lab1"))).as("label")))
      // convergence = an aggregate over the label table (no data collect)
      changed = next.filter(col("label") =!= col("old")).count()
      labelsCkpt.unpersist()
      labelsCkpt = next
      labels = next.select("id", "label")
      it += 1
    }
    e.unpersist()
    (labels, it - 1)
  }

  /** INCREMENTAL cluster maintenance: merge a batch of NEW pairs into a
    * persisted `(id, cluster_id)` labeling, touching only the affected
    * part of the graph — the dedup DECISION made incremental, to pair with
    * the incremental pair finding (`minhashIncrementalPairs`).
    *
    * Identity: `mergeNewPairs(minLabel(P1), P2) == minLabel(P1 ∪ P2)`
    * (spec-pinned) — because a min-id labeling is a depth-1 forest, new
    * pairs only interact with old clusters through their ROOTS: each new
    * pair maps to its endpoints' roots (unlabeled ids root to themselves),
    * components are solved on that root graph (O(new pairs) vertices, not
    * O(corpus)), and the old labeling is re-rooted through the affected
    * roots only. The min-id invariant is preserved: merged root = min over
    * member roots = min id of the merged component.
    *
    * 100 TB posture: everything is sized by the batch except the final
    * re-root, which is a map-side broadcast join against the labeling
    * (the affected-root table is new-pair-sized) — the persisted labeling
    * is never shuffled and never recomputed.
    *
    * @param labeling persisted `(id, cluster_id)` table (cluster_id = min
    *                 member id, as [[minLabel]] emits)
    * @param newPairs arriving pair batch; direction irrelevant
    */
  def mergeNewPairs(labeling: DataFrame, newPairs: DataFrame,
                    src: String, dst: String): DataFrame = {
    val lab = labeling.select(col("id"), col("cluster_id"))
    // the pair DELTA is materialized once: this plan consumes it three ways
    // (root join, both newVerts union arms), and without the checkpoint each
    // consumer re-executes whatever upstream pair-finding is not already
    // materialized. With the caller's window fix this cut e2_cc_incremental's
    // merge overhead beyond shared pair finding from ~8.8 s to ~4.4 s warm
    // at 10× (ProfileCCInc, round 8). Nightly-delta-sized, so the
    // materialization is tiny by the same argument that makes the
    // incremental contract worthwhile.
    val pairs = newPairs.select(col(src).as("a"), col(dst).as("b"))
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    val ra = lab.select(col("id").as("a"), col("cluster_id").as("ra"))
    val rb = lab.select(col("id").as("b"), col("cluster_id").as("rb"))
    val rootPairs = pairs
      .join(ra, Seq("a"), "left").join(rb, Seq("b"), "left")
      .select(coalesce(col("ra"), col("a")).as("ra"),
        coalesce(col("rb"), col("b")).as("rb"))
      .filter(col("ra") =!= col("rb"))
    // components over the ROOT graph only — affected roots, not the corpus
    val rootLab = minLabel(rootPairs, "ra", "rb")
    // ids arriving with the batch that the labeling has never seen
    val newVerts = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id")))
      .distinct()
      .join(lab.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    // broadcast is EXPLICIT: rootLab descends from a localCheckpoint'd RDD
    // with no stats (default sizeInBytes = huge), so without the hint Spark
    // plans a sort-merge join and shuffles the corpus-sized labeling — the
    // opposite of the "never shuffled" contract (round-5 advice; pinned in
    // PlanSpec). The affected-root table is new-pair-sized, always small.
    lab.unionByName(newVerts)
      .join(broadcast(rootLab.select(col("id").as("cluster_id"),
        col("label").as("new_root"))), Seq("cluster_id"), "left")
      .select(col("id"),
        coalesce(col("new_root"), col("cluster_id")).as("cluster_id"))
  }

  /** [[minLabel]] plus per-cluster size — the direct input to a
    * cluster-keeper dedup decision (`keep id == label`, drop the rest). */
  def clusters(edges: DataFrame, src: String, dst: String): DataFrame = {
    val labeled = minLabel(edges, src, dst)
    val sizes = labeled.groupBy(col("label").as("l"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, labeled("label") === sizes("l"))
      .select(col("id"), col("label").as("cluster_id"), col("cluster_size"))
  }
}
