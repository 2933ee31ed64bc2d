package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the §4.4c pipeline end-to-end: the standard
  * DataFrame top-k-per-key idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W.partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn") }}}
  *
  * is rewritten — transparently, with no API change — into the native
  * [[TopKPerKey]] logical node, which then plans as the partial/final
  * bounded-heap operator instead of a full per-partition sort. Fires only
  * when the rank column is DROPPED above the filter (if the rank value is
  * kept, the window's output is genuinely needed) and the predicate pins
  * a constant k: `rn <= k`, `rn < k`, or `rn = 1`.
  *
  * Row-set equivalence: for a tie-free ordering both forms return the
  * same rows; under boundary ties both pick an arbitrary winner —
  * row_number by partition encounter order, the heap by replacement
  * order — so the rewrite preserves the (already nondeterministic)
  * semantics exactly as far as the original guarantees them.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** Constant bound from the rank predicate, if it has a supported shape. */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(al @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
          _)), _, _, child, _)))
        if part.nonEmpty && order.nonEmpty =>
      val rn = al.toAttribute
      val keepsRank = projectList.exists(_.references.contains(rn))
      boundOf(cond, rn) match {
        case Some(k) if k > 0 && !keepsRank =>
          Project(projectList, TopKPerKey(part, order, k, child))
        case Some(k) if k > 0 && keepsRank =>
          // rank kept: the rank-preserving operator emits the 1..k
          // position under the SAME attribute (exprId) the window alias
          // bound, so the project resolves unchanged and the filter is
          // subsumed by the bound
          Project(projectList, TopKPerKey(part, order, k, child, Some(rn)))
        case Some(k) if k <= 0 =>
          // rn <= 0 is the empty result; leave it to the normal planner
          p
        case _ => p
      }

    // bare Filter(Window) — no project above, so the rank column is part
    // of the output by construction: rank-preserving rewrite
    case f @ Filter(cond, Window(Seq(al @ Alias(
        WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
        _)), _, _, child, _))
        if part.nonEmpty && order.nonEmpty =>
      val rn = al.toAttribute
      boundOf(cond, rn) match {
        case Some(k) if k > 0 => TopKPerKey(part, order, k, child, Some(rn))
        case _ => f
      }
  }
}
