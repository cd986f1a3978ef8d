package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalLimit, LogicalPlan, Union, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-injected SCALE GUARD — the PlanSpec discipline promoted
  * into the session itself: an unpartitioned `Window` funnels its
  * entire input through ONE task, which is the single most common way
  * a correct-at-test-scale Spark job dies at 100 TB. With
  * `spark.graft.strictGlobalWindows=true`, any optimized plan that
  * contains a global window over an UNBOUNDED input fails analysis
  * loudly at plan time — before a single task runs — instead of
  * timing out on a cluster hours later.
  *
  * Bounded inputs stay legal, because the k-row rank-stamp pattern
  * (TakeOrdered top-k, then `row_number` over the ≤ k survivors — the
  * q75/s41/t45 shape) is exactly the sanctioned use of a global
  * window: the guard walks the window's subtree and allows it when a
  * `Limit` or a grouping-free (one-row) `Aggregate` bounds it.
  *
  * The rule REWRITES NOTHING — `apply` returns the plan unchanged —
  * so it cannot alter results; it is a gate, not a transform
  * (Delta's own invariant checks use the same injected-rule shape).
  * Default off: the flag is a deployment dial, set it in the cluster
  * conf the way ANSI mode is. Registered via
  * [[GraftExtensions]]'s `injectOptimizerRule`. */
case class PlanGuardRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Is `p`'s output cardinality bounded by construction? Multi-child
    * nodes are handled by how they PROPAGATE a bound, not by
    * `exists` — a join of limit(k) with an unbounded table, or a
    * union with one limited leg, must NOT count as bounded:
    *   - semi/anti join: output ≤ left, so the left bound suffices;
    *   - every other join type can fan out per match (or emit the
    *     unbounded side's unmatched rows), so BOTH sides must bound;
    *   - union: output = Σ children, so ALL legs must bound;
    *   - single-child pass-throughs (Project/Filter/...) inherit. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => bounded(j.left)
      case _ => bounded(j.left) && bounded(j.right)
    }
    case u: Union => u.children.forall(bounded)
    case other if other.children.size == 1 => bounded(other.children.head)
    case other =>
      other.children.nonEmpty && other.children.forall(bounded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.strictGlobalWindows", "false")
        .toBoolean) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
          throw new IllegalStateException(
            "graft strict plan guard: unpartitioned Window over an " +
              "unbounded input funnels the whole dataset through one " +
              "task at scale. Partition the window, pre-aggregate to " +
              "a bounded frame, or use graft.ops.Ranks for global " +
              s"order statistics. Offending node:\n$w")
        case _ => ()
      }
    }
    plan
  }
}
