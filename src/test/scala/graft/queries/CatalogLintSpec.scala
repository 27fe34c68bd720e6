package graft.queries

import graft.SparkSpec
import graft.plans.PlanLint

/** The whole-catalog plan-governance net: PlanLint over all 160 queries,
  * with every finding either absent or on the JUSTIFIED allowlist below. A
  * refactor that plants a cartesian product, a theta-BNLJ, a global window,
  * or a single-partition shuffle in ANY catalog row — not just the handful
  * PlanSpec pins individually — fails here with the offending node printed.
  *
  * The allowlist is the documented set of bounded exceptions:
  *  - global-window / single-partition-exchange over AGGREGATED inputs
  *    whose cardinality is structurally bounded (a27's ≤ k+1 candidate
  *    groups, e4_gate_attrition's 4 funnel stages, j12's supplier-grain
  *    revenue view) — Catalyst can't see the bound, the operator contract
  *    guarantees it;
  *  - theta-bnlj on the brute-force EXACT rows that exist as oracle-
  *    replayable baselines for their bucketed scale twins (edit-distance
  *    verifiers → e2_edit_blocked's banded path at scale; exact cosine
  *    baselines and the bounded 50-query dense retriever → e3_lsh_ann /
  *    e3_ivf_store at scale).
  */
class CatalogLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def allowed = CatalogLintSpec.allowed

  test("every catalog plan is lint-clean modulo the justified allowlist") {
    val bad = for {
      (name, fn) <- QueryCatalog.queries.toSeq.sortBy(_._1)
      f <- PlanLint.audit(fn(spark, dir))
      if !allowed.getOrElse(name, Set.empty).contains(f.rule)
    } yield s"$name $f"
    assert(bad.isEmpty, "unsanctioned plan findings:\n" + bad.mkString("\n"))
  }

  test("the allowlist carries no dead entries") {
    // an allowlisted rule that no longer fires means the plan improved —
    // shrink the list so it can't silently mask a future regression
    val live = (for {
      (name, fn) <- allowed.keys.toSeq.map(n => n -> QueryCatalog.queries(n))
      f <- PlanLint.audit(fn(spark, dir))
    } yield (name, f.rule)).toSet
    val dead = for {
      (name, rules) <- allowed.toSeq; r <- rules
      if !live.contains((name, r))
    } yield s"$name/$r"
    assert(dead.isEmpty, s"allowlist entries that no longer fire: $dead")
  }
}

/** The one justified-findings allowlist, shared by the sf0.001 sweep above
  * and the scale-fixture sweep ([[ScaleCatalogLintSpec]]) so the two nets
  * cannot drift apart. */
object CatalogLintSpec {

  val allowed: Map[String, Set[String]] = Map(
    "a27_heavy_hitters" -> Set("global-window", "single-partition-exchange"),
    "e4_gate_attrition" -> Set("global-window", "single-partition-exchange"),
    "j12_top_revenue_supplier" ->
      Set("global-window", "single-partition-exchange"),
    // the deterministic-sampling rows project the SAME md5 bucket their
    // filter selects on (the output contract exposes the bucket): the hash
    // is over a short key string, not the document, so the double
    // evaluation is cheap and restructuring around pushdown isn't worth it
    "e8_stratified_sample" -> Set("filter-reevaluates-projection"),
    "e8_weighted_sample" -> Set("filter-reevaluates-projection"),
    // threshold-gate pattern: crossJoin a 1-row (or stats-table) AGGREGATE,
    // then filter against it — the optimizer folds the predicate into the
    // Cross BNLJ, which the tightened theta-bnlj rule flags (it must: the
    // same shape against a data-sized broadcast is an outage). Here the
    // broadcast side is structurally bounded aggregate output.
    "e4_quality_p75" -> Set("theta-bnlj"),
    "e8_mix_rebalance" -> Set("theta-bnlj"),
    "j13_dormant_customers" -> Set("theta-bnlj"),
    // j22 (Q11 shape): the broadcast side is the ONE-ROW (total, n_parts)
    // re-aggregate of the per-part table — the global-ratio HAVING gate
    "j22_important_parts" -> Set("theta-bnlj"),
    // (e2_edit_blocked's theta-bnlj entry was removed in round 13: the row
    // now reads the once-per-fixture persisted pair artifact — verdict
    // item 5 — so the short×short fallback join sits behind the artifact
    // build, not in the row's plan)
    // the routed row plans the SAME two justified nodes the exact join
    // has (short×short fallback) and e2_edit_candidates has (length-
    // dictionary broadcast) — routing adds a pricing pass, not a new
    // join shape
    "e2_edit_routed" -> Set("theta-bnlj"),
    // same justified node as e2_edit_blocked: the probe side's |n−m| ≤ t
    // inequality join against the BROADCAST length dictionary — a
    // handful-of-rows build side at any corpus size (distinct string
    // lengths), the sanctioned tiny-broadcast theta shape
    "e2_edit_candidates" -> Set("theta-bnlj"),
    // (e2_edit_blocked_audit's inherited theta-bnlj entry was removed in
    // round 11: the audit now checkpoints the pair set, so the blocking
    // join sits behind a checkpoint leaf and the finding no longer fires)
    "e2_edit_distance" -> Set("theta-bnlj"),
    "e3_cosine_pairs" -> Set("theta-bnlj"),
    "e3_cosine_topk" -> Set("theta-bnlj"),
    // (e3_recall_report needs no entry: its brute-force ground truths sit
    // behind eager checkpoints, so their scans run once, their theta joins
    // never reach the row's plan, and the three hits/total one-row
    // crossJoins carry checkpoint-leaf size estimates below the rule's bar)
    "e3_embed_neardup" -> Set("theta-bnlj"),
    "e3_hybrid_rrf" -> Set("theta-bnlj"),

    // ---- repeated-derived-subtree adjudications (round 11) ----
    // The rule flags compute that executes once per consumer because it
    // sits ABOVE a (reused) exchange. Each entry below is a case where
    // re-executing that compute is CHEAPER or safer than materializing:
    //
    // a16: the dev table (fact ⋈ broadcast median) feeds the MAD aggregate
    // and the final gate — re-executing it is a map-side broadcast-join
    // rescan of a 2-column columnar projection, embarrassingly parallel at
    // any scale; materializing would write a fact-sized intermediate. The
    // query doc declares the three-scan shape as the honest cost of exact
    // MAD.
    "a16_mad_outliers" -> Set("repeated-derived-subtree"),
    // a21: the full-outer merge of the two bucket-rate tables feeds the
    // totals and the PSI terms. Both inputs are aggregated to ≤4 rows per
    // event_type (structurally bounded, the same bound the global-window
    // allowlist entries rest on); the re-executed merge join is over
    // bucket-level rows only — the fact-sized aggregations beneath are
    // deduplicated by exchange reuse.
    "a21_psi_drift" -> Set("repeated-derived-subtree"),
    // e2 bounded-verifier self-joins: the shingle/band Generate runs once
    // per join side. The exploded table is ~shingle-count× its input —
    // materializing it costs far more I/O than re-running a codegen'd
    // explode over the bounded slice (e2_containment/e2_ngram_jaccard:
    // doc_id < 300/500 verifier slices; e2_simhash*: 4 band rows per
    // signature; e2_neardup_incremental: the explode re-runs over the
    // O(batch) arriving side only — the store side reads its parquet
    // artifact).
    "e2_containment" -> Set("repeated-derived-subtree"),
    "e2_ngram_jaccard" -> Set("repeated-derived-subtree"),
    "e2_simhash" -> Set("repeated-derived-subtree"),
    "e2_simhash_md5" -> Set("repeated-derived-subtree"),
    "e2_neardup_incremental" -> Set("repeated-derived-subtree"),
    // e4 vocabulary totals consumed twice: the re-executed aggregate is
    // the final (above-exchange) step over vocab/alphabet-bounded groups —
    // corpus-level tiny tables where a checkpoint would cost more than the
    // recompute (e4_jsd: one term-table agg). e4_char_entropy left this
    // list in round 17: its duplicated subtree was the full corpus regex
    // explode, not a tiny aggregate — the CharCounts kernel + cf
    // checkpoint removed it (100× pin 30.9 → 8.8 s), so the entry would
    // now be dead.
    "e4_jsd" -> Set("repeated-derived-subtree"),
    // e3_pq_distortion (round 17): the PQ sub-block Generate
    // (explode(0..7) + slice) runs once per consumer — the distortion
    // branch, the doc-encode join, and the 10-query broadcast side. Same
    // adjudication as the e2 shingle explodes above: the exploded table is
    // 8× its input and every re-run is a codegen'd map-side slice over the
    // (exchange-reused) corpus scan, so materializing it would trade three
    // cheap rescans for a corpus-sized write. The expensive parts beneath
    // (encode aggregate, err shuffle) are deduplicated by exchange reuse.
    "e3_pq_distortion" -> Set("repeated-derived-subtree"))
}
