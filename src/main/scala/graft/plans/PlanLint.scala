package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, Md5, RegExpExtractAll, RegExpReplace, Sha2, StringSplit}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linting: the scale anti-patterns PlanSpec pins for
  * individual catalog queries, productized as a tree-walking audit any
  * pipeline can run in CI before a 100 TB deploy. A plan that passes tests
  * at sf0.01 can still hide a quietly-planted cartesian product or a
  * single-partition window that only detonates at cluster scale — these are
  * exactly the regressions that are cheap to catch at plan time and
  * expensive to catch at 3 a.m.
  *
  * Findings are ADVISORIES with the node and its logical size estimate
  * attached: a cross join against a 10-row dimension is a fine plan, the
  * same shape against a fact table is an outage. Callers gate on
  * `findings.filter(_.approxBytes > threshold)` or on specific rules.
  *
  * Rules:
  *  - `cartesian-product`: a CartesianProductExec anywhere — both sides
  *    data-sized (Spark broadcasts one side otherwise), output quadratic.
  *  - `theta-bnlj`: a BroadcastNestedLoopJoin with a join condition — the
  *    fallback strategy for inequality joins; per-row full scan of the
  *    broadcast side. (Condition-free Cross BNLJ is the deliberate tiny-
  *    broadcast pattern — 1-row totals, quantizer tables — and not flagged.)
  *  - `global-window`: a WindowExec with an empty PARTITION BY — every row
  *    moves to one task; unbounded at scale.
  *  - `single-partition-exchange`: a shuffle into ONE partition (e.g.
  *    `repartition(1)`, non-top-k global sort) — a one-task bottleneck.
  *  - `filter-reevaluates-projection`: an EXPENSIVE expression (regexp,
  *    crypto hash, higher-order lambda, a custom kernel) appearing in BOTH
  *    a Filter condition and a Project list — the signature of predicate
  *    pushdown re-substituting an alias below its projection, which
  *    evaluates the expression twice per row. Found live in this engine
  *    (the e4_fingerprint / MinHash-signing double-eval, §14.11): the fix
  *    is a cheap equivalent precondition before the projection.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, approxBytes: BigInt) {
    override def toString: String = s"[$rule] ~${approxBytes}B $node"
  }

  /** Audit the (initial, pre-AQE-execution) physical plan of `df`. */
  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.executedPlan)

  def auditPlan(root: SparkPlan): Seq[Finding] = {
    val plan = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val projected: Set[Expression] = plan.collect {
      case p: ProjectExec => p.projectList: Seq[Expression]
      case g: org.apache.spark.sql.execution.GenerateExec =>
        Seq(g.generator: Expression)
    }.flatten.flatMap(_.collect {
      case e if isExpensive(e) => e.canonicalized
    }).toSet
    val reeval = plan.collect {
      case f: FilterExec => f.condition.collect {
        case e if isExpensive(e) && projected.contains(e.canonicalized) =>
          Finding("filter-reevaluates-projection", oneLine(f), sizeOf(f))
      }
    }.flatten.distinct
    reeval ++ plan.collect {
      case c: CartesianProductExec =>
        Finding("cartesian-product", oneLine(c), sizeOf(c))
      // any BNLJ WITH a condition is the per-row-scan fallback — including
      // crossJoin(...).filter(inequality), which the optimizer folds into a
      // Cross-typed BNLJ carrying the predicate (review finding: the
      // joinType exemption here was a false-negative hole). The sanctioned
      // tiny-broadcast pattern is condition-FREE and stays unflagged.
      case b: BroadcastNestedLoopJoinExec if b.condition.isDefined =>
        Finding("theta-bnlj", oneLine(b), sizeOf(b))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Finding("global-window", oneLine(w), sizeOf(w.child))
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition &&
            !isGlobalPartialAgg(e.child) =>
        Finding("single-partition-exchange", oneLine(e), sizeOf(e.child))
    }
  }

  /** The one legitimate single-partition shuffle: the partial side of a
    * GLOBAL aggregate (empty grouping — one row per input task reaches the
    * exchange, bounded by parallelism, not data). */
  private def isGlobalPartialAgg(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      a.groupingExpressions.isEmpty
    case _ => false
  }

  /** Per-row-expensive expressions: one evaluation is a budget, two is a
    * bug. Custom kernels are recognized by their package. */
  private def isExpensive(e: Expression): Boolean = e match {
    case _: HigherOrderFunction | _: RegExpExtractAll | _: RegExpReplace |
        _: StringSplit | _: Sha2 | _: Md5 => true
    case _ => e.getClass.getName.startsWith("graft.expressions.")
  }

  /** Size estimate of the node's logical twin (Catalyst stats) — crude
    * without CBO, but enough to separate "10-row dimension" from "the fact
    * table"; -1 when no logical link survives. */
  private def sizeOf(p: SparkPlan): BigInt =
    p.logicalLink.map(_.stats.sizeInBytes).getOrElse(BigInt(-1))

  private def oneLine(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(200)
}
