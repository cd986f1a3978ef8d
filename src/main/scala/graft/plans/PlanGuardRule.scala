package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Range, SHUFFLE_REPLICATE_NL, Union, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-injected SCALE GUARD — the PlanSpec discipline promoted
  * into the session itself: the two classic ways a
  * correct-at-test-scale Spark job dies at 100 TB fail ANALYSIS, at
  * plan time, before a single task runs.
  *
  * 1. `spark.graft.strictGlobalWindows` — an unpartitioned `Window`
  *    funnels its entire input through ONE task. Any optimized plan
  *    containing a global window over an UNBOUNDED input is rejected.
  *    Bounded inputs stay legal, because the k-row rank-stamp pattern
  *    (TakeOrdered top-k, then `row_number` over the ≤ k survivors —
  *    the q75/s41/t45 shape) is exactly the sanctioned use of a global
  *    window: the guard walks the window's subtree and allows it when
  *    a `Limit`, a grouping-free (one-row) `Aggregate`, or literal
  *    driver-side data bounds it.
  *
  * 2. `spark.graft.strictCartesian` — a join with NO equi-join key
  *    (cross join, condition-less join, or a purely non-equi
  *    condition) executes as a cartesian product / nested-loop join:
  *    O(|L|·|R|) row pairs, quadratic at scale. Rejected unless one
  *    side is bounded, one side carries an explicit `BROADCAST` hint
  *    (the sanctioned `crossJoin(broadcast(scalarAgg))` attach idiom),
  *    or a side carries the `SHUFFLE_REPLICATE_NL` hint — graft's
  *    explicit allow-cartesian opt-in, used by the two documented
  *    blocked exact tiers (`Vectors.nearDupPairs`,
  *    `Vectors.knnGraphEdgesBlocked`) whose all-pairs volume is the
  *    declared contract and whose block form bounds task memory.
  *
  * The rule REWRITES NOTHING — `apply` returns the plan unchanged —
  * so it cannot alter results; it is a gate, not a transform
  * (Delta's own invariant checks use the same injected-rule shape).
  * Both flags default off in the rule itself, but the driver-session
  * contract ([[graft.GraftSessions.common]]) pins them ON for every
  * Verify/Bench entry point — in production they are the cluster-conf
  * dial, set the way ANSI mode is. Registered via [[GraftExtensions]]
  * 's `injectOptimizerRule`. */
case class PlanGuardRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  /** Is `p`'s output cardinality bounded by construction? Multi-child
    * nodes are handled by how they PROPAGATE a bound, not by
    * `exists` — a join of limit(k) with an unbounded table, or a
    * union with one limited leg, must NOT count as bounded:
    *   - semi/anti join: output ≤ left, so the left bound suffices;
    *   - every other join type can fan out per match (or emit the
    *     unbounded side's unmatched rows), so BOTH sides must bound;
    *   - union: output = Σ children, so ALL legs must bound;
    *   - literal driver-side data (LocalRelation/OneRowRelation) is
    *     bounded by construction — it already fits on the driver;
    *   - single-child pass-throughs (Project/Filter/...) inherit. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: LocalRelation | _: OneRowRelation => true
    // Range's cardinality is a plan-time literal: bounded when small.
    // The cap matters for BOTH guards — a window over range(10^9) is
    // a genuine one-task funnel, and range(10^9) × corpus a genuine
    // explosion, so a large literal Range stays unbounded.
    case r: Range => r.numElements.isValidLong &&
      r.numElements.toLong <= 100000L
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => bounded(j.left)
      case _ => bounded(j.left) && bounded(j.right)
    }
    case u: Union => u.children.forall(bounded)
    case other if other.children.size == 1 => bounded(other.children.head)
    case other =>
      other.children.nonEmpty && other.children.forall(bounded)
  }

  /** Does the join condition contain at least one equi-predicate with
    * one leg evaluable on the left and the other on the right — i.e.
    * will planning extract hash-join keys (the `ExtractEquiJoinKeys`
    * criterion) instead of falling to nested-loop/cartesian? */
  private def hasEquiKeys(j: Join): Boolean = {
    def splits(l: Expression, r: Expression): Boolean =
      (canEvaluate(l, j.left) && canEvaluate(r, j.right)) ||
        (canEvaluate(l, j.right) && canEvaluate(r, j.left))
    j.condition.exists(splitConjunctivePredicates(_).exists {
      case EqualTo(l, r)       => splits(l, r)
      case EqualNullSafe(l, r) => splits(l, r)
      case _                   => false
    })
  }

  /** A keyless join is sanctioned when its volume is provably not
    * quadratic-in-corpus (a bounded side), when it is the broadcast
    * scalar-attach idiom, or when it carries graft's explicit
    * allow-cartesian opt-in (`hint("shuffle_replicate_nl")`). */
  private def sanctionedCartesian(j: Join): Boolean = {
    def hinted(side: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
      side.exists(h => h.strategy.contains(BROADCAST) ||
        h.strategy.contains(SHUFFLE_REPLICATE_NL))
    bounded(j.left) || bounded(j.right) ||
      hinted(j.hint.leftHint) || hinted(j.hint.rightHint)
  }

  private def flag(name: String): Boolean =
    conf.getConfString(name, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val strictWindows = flag("spark.graft.strictGlobalWindows")
    val strictCartesian = flag("spark.graft.strictCartesian")
    if (strictWindows || strictCartesian) {
      plan.foreach {
        case w: Window if strictWindows && w.partitionSpec.isEmpty &&
            !bounded(w.child) =>
          throw new IllegalStateException(
            "graft strict plan guard: unpartitioned Window over an " +
              "unbounded input funnels the whole dataset through one " +
              "task at scale. Partition the window, pre-aggregate to " +
              "a bounded frame, or use graft.ops.Ranks for global " +
              s"order statistics. Offending node:\n$w")
        case j: Join if strictCartesian && !hasEquiKeys(j) &&
            !sanctionedCartesian(j) =>
          throw new IllegalStateException(
            "graft strict plan guard: join without an equi-key " +
              "between two unbounded inputs plans as a cartesian/" +
              "nested-loop product — O(|L|*|R|) at scale. Add an " +
              "equi-join key (bucket/band/cell the candidates), " +
              "broadcast() a provably small side, or opt in " +
              "explicitly with hint(\"shuffle_replicate_nl\") for a " +
              "documented exact all-pairs tier. Offending node:\n" + j)
        case _ => ()
      }
    }
    plan
  }
}
