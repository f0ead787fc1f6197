package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.JaccardSim

/** Catalyst optimizer extension: threshold-pruning for Jaccard filters.
  *
  * With s(X) = |distinct(X)|: `jaccard(A, B) >= t` implies
  * `s(A) >= t·s(B) AND s(B) >= t·s(A)` (|A∩B| ≤ min and |A∪B| ≥ max of the
  * SET sizes, so j ≥ t ⟹ min ≥ t·max — distinct sizes, not raw lengths:
  * raw lengths would be unsound for arrays with duplicates). The rule
  * conjoins that cheap ratio test in front of the full set computation, so
  * grossly mismatched candidate pairs short-circuit early — on an LSH
  * verify stage this prunes without changing a single result row (the
  * implied predicate is never stricter than the original).
  *
  * The rewritten JaccardSim is marked `prefiltered` so the fixpoint
  * optimizer applies the rule exactly once per occurrence.
  */
class JaccardThresholdPruning extends Rule[LogicalPlan] {

  private def sizeOf(e: Expression): Expression =
    Cast(Size(ArrayDistinct(e), legacySizeOfNull = false), DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transform {
        case GreaterThanOrEqual(j @ JaccardSim(a, b, false), t @ Literal(_, DoubleType)) =>
          And(
            And(GreaterThanOrEqual(sizeOf(a), Multiply(t, sizeOf(b))),
                GreaterThanOrEqual(sizeOf(b), Multiply(t, sizeOf(a)))),
            GreaterThanOrEqual(j.copy(prefiltered = true), t))
        case GreaterThan(j @ JaccardSim(a, b, false), t @ Literal(_, DoubleType)) =>
          And(
            And(GreaterThanOrEqual(sizeOf(a), Multiply(t, sizeOf(b))),
                GreaterThanOrEqual(sizeOf(b), Multiply(t, sizeOf(a)))),
            GreaterThan(j.copy(prefiltered = true), t))
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

/** Session extension entry point:
  * `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => new JaccardThresholdPruning)
}
