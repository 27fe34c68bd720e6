package graft.plans

import org.apache.spark.sql.DataFrame

/** The cardinality statistic behind cost-routed operator shapes (round-9
  * verdict item 6, lifted from `AnalyticsOps.supplierCount` so the next
  * cardinality-routed operator reuses it instead of reinventing it).
  *
  * A handful of operators in this engine pick their PHYSICAL shape from a
  * dimension's cardinality — exactly the statistic a CBO reads from the
  * catalog (g2's pair-key-space routing between map-side partial
  * aggregation and explicit repartition-on-key is the canonical case).
  * Resolution order:
  *
  *  1. **Catalyst plan statistics**: when the frame's optimized plan
  *     carries a `rowCount` (an ANALYZE'd catalog table with
  *     `spark.sql.cbo.enabled` / `spark.sql.cbo.planStats.enabled`, or any
  *     plan CBO can propagate a count through), that number is used —
  *     zero jobs, and the routing reads the same catalog a real warehouse
  *     deployment maintains.
  *  2. **Caller fallback** (by-name, evaluated only on a stats miss):
  *     typically a memoized `count()` of the dimension — one real job per
  *     fixture, cheap because routed statistics are dimension-sized by
  *     construction (routing on a fact-sized count would cost what it
  *     saves).
  *
  * The estimate-vs-exact distinction is safe here BY CONTRACT: callers
  * route physical shape only (every shape must produce identical results —
  * g2's routing spec asserts that identity), so a stale catalog statistic
  * can cost performance, never correctness.
  */
object CardinalityStats {

  /** Row count of `df`, preferring Catalyst plan statistics over the
    * by-name `fallback` (see object doc for the contract). */
  def rowCount(df: DataFrame)(fallback: => Long): Long =
    df.queryExecution.optimizedPlan.stats.rowCount
      .map(_.longValue)
      .getOrElse(fallback)
}
