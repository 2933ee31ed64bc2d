package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4.4c): `size(filter(arr, f)) > 0` ⇒
  * `exists(arr, f)`.
  *
  * The left form — the natural way users (and generated FHIR token
  * predicates) write array membership — materializes the whole filtered
  * array per row and then counts it; `exists` stops at the first match.
  * On wide coding arrays that is the difference between O(|arr|) work +
  * an allocation per row and an early-exit scan.
  *
  * Guarded on `legacySizeOfNull = false` (the Spark 4 default): there
  * `size(null) = null`, so both forms yield NULL on null arrays and the
  * rewrite is semantics-preserving even outside filter context. (Under
  * the legacy flag `size(null) = -1` makes the left form FALSE where
  * `exists` is NULL — same filter behavior but a different projected
  * value — so the rule leaves those untouched.)
  *
  * The substituted `exists` is pinned to `followThreeValuedLogic = false`
  * regardless of the session default: `filter` DROPS elements whose
  * predicate evaluates to NULL, so `size(filter(a, f))` compares a
  * null-free count and is two-valued for any non-null array. Three-valued
  * `exists` would instead return NULL when the lambda is NULL for some
  * element and TRUE for none — silently dropping rows a WHERE clause on
  * the original form kept (FHIR-style predicates over nullable struct
  * fields hit exactly this). Non-3VL `exists` — TRUE iff some element is
  * TRUE, else FALSE, NULL only for a null array — matches the size/filter
  * form bit-for-bit on all inputs.
  */
object SimplifyArrayExistence extends Rule[LogicalPlan] {

  private def existsOf(arg: Expression, fn: Expression): Expression =
    ArrayExists(arg, fn, followThreeValuedLogic = false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // size(filter(a, f)) > 0  /  0 < size(filter(a, f))
      case GreaterThan(Size(ArrayFilter(arg, fn), false), IntegerLiteral(0)) =>
        existsOf(arg, fn)
      case LessThan(IntegerLiteral(0), Size(ArrayFilter(arg, fn), false)) =>
        existsOf(arg, fn)
      // size(filter(a, f)) >= 1  /  1 <= size(filter(a, f))
      case GreaterThanOrEqual(Size(ArrayFilter(arg, fn), false), IntegerLiteral(1)) =>
        existsOf(arg, fn)
      case LessThanOrEqual(IntegerLiteral(1), Size(ArrayFilter(arg, fn), false)) =>
        existsOf(arg, fn)
      // size(filter(a, f)) = 0  ⇒  NOT exists — same null behavior under
      // non-legacy size semantics
      case EqualTo(Size(ArrayFilter(arg, fn), false), IntegerLiteral(0)) =>
        Not(existsOf(arg, fn))
      case EqualTo(IntegerLiteral(0), Size(ArrayFilter(arg, fn), false)) =>
        Not(existsOf(arg, fn))
    }
}
