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
    "e2_edit_blocked" -> Set("theta-bnlj"),
    // the audit row contains the full e2_edit_blocked plan (it audits that
    // row's output), so it inherits the same justified finding
    "e2_edit_blocked_audit" -> Set("theta-bnlj"),
    "e2_edit_distance" -> Set("theta-bnlj"),
    "e3_cosine_pairs" -> Set("theta-bnlj"),
    "e3_cosine_topk" -> Set("theta-bnlj"),
    "e3_embed_neardup" -> Set("theta-bnlj"),
    "e3_hybrid_rrf" -> Set("theta-bnlj"))
}
