package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning THROUGH [[AsOfJoinPlan]] — the one documented gap in
  * the custom operator (r8 probe: a bare `count()` above the join ran
  * 0.92 s vs 0.22 s for the window form, because Catalyst cannot see
  * into a fixed-output custom node and both children carried every
  * column through the exchange + sort).
  *
  * Catalyst's own `ColumnPruning` only knows the built-in nodes, so
  * this rule supplies the missing case: when a `Project` or an
  * `Aggregate` sits directly above the as-of join and does not consume
  * every joined column, each child is wrapped in a `Project` keeping
  * only (parent references ∪ key/ts/tie). The inserted Projects are
  * ordinary nodes, so the surrounding fixed-point batch then pushes
  * them down to the scans (`ReadSchema` shrinks — plan-audited in
  * AsOfJoinSpec) and merges adjacent Projects; on the next pass the
  * children's output already equals the kept set and the rule is a
  * no-op (idempotent under fixed point).
  *
  * At 100 TB this is the difference between shuffling a wide state
  * table twice (once per side of the co-partitioning exchange) and
  * shuffling only the columns the query actually reads. */
object AsOfColumnPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case pr: Project if pr.child.isInstanceOf[AsOfJoinPlan] =>
      pr.withNewChildren(Seq(
        pruned(pr.child.asInstanceOf[AsOfJoinPlan], pr.references)))
    case ag: Aggregate if ag.child.isInstanceOf[AsOfJoinPlan] =>
      ag.withNewChildren(Seq(
        pruned(ag.child.asInstanceOf[AsOfJoinPlan], ag.references)))
  }

  private def pruned(j: AsOfJoinPlan, parentRefs: AttributeSet): LogicalPlan = {
    // the merge itself always needs its key/ts/tie columns, whatever
    // the parent consumes
    val required = parentRefs ++ AttributeSet(Seq[Expression](
      j.leftKey, j.leftTs, j.leftTie, j.rightKey, j.rightTs, j.rightTie))
    def trim(side: LogicalPlan): LogicalPlan = {
      val kept = side.output.filter(required.contains)
      if (kept.length == side.output.length) side else Project(kept, side)
    }
    val (l, r) = (trim(j.left), trim(j.right))
    if ((l eq j.left) && (r eq j.right)) j else j.copy(left = l, right = r)
  }
}
