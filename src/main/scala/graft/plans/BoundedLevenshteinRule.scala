package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite unbounded edit-distance threshold predicates into
  * Spark's banded (Ukkonen) form, turning the O(len²) DP per pair into
  * O(len·k):
  *
  *   levenshtein(a, b) <= k   ⇒  levenshtein(a, b, k) != -1
  *   levenshtein(a, b) <  k   ⇒  levenshtein(a, b, k-1) != -1
  *   (plus the mirrored literal-first comparisons)
  *
  * Value-identical: the bounded form returns the true distance when it is
  * within the threshold and -1 past it, so `!= -1` is exactly the original
  * predicate; NULL inputs propagate to NULL on both forms. This is the
  * q_ext_edit_distance lesson packaged as a Rule[LogicalPlan] — a user can
  * write the natural predicate and the session rewrites it to the banded
  * plan (`GraftExtensions.injectOptimizerRule`, or
  * `spark.experimental.extraOptimizations` on an existing session).
  *
  * Only non-negative integer literal thresholds rewrite; anything else
  * (column thresholds, negative k — already always-false) is left alone.
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {
  private def banded(l: Expression, r: Expression, k: Int): Expression =
    Not(EqualTo(Levenshtein(l, r, Some(Literal(k))), Literal(-1)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), IntegerLiteral(k)) if k >= 0 =>
      banded(l, r, k)
    case LessThan(Levenshtein(l, r, None), IntegerLiteral(k)) if k >= 1 =>
      banded(l, r, k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), Levenshtein(l, r, None)) if k >= 0 =>
      banded(l, r, k)
    case GreaterThan(IntegerLiteral(k), Levenshtein(l, r, None)) if k >= 1 =>
      banded(l, r, k - 1)
  }
}
