package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Filter pushdown through [[AsOfJoinPlan]] — the optimizer-rule tier of
  * the custom-operator stack (Expression → LogicalPlan/Strategy/Exec →
  * Rule). Catalyst's own `PushDownPredicates` only understands built-in
  * nodes, so without this rule a `WHERE` above an as-of join filters AFTER
  * the join: both sides shuffle and merge in full. At 100 TB that is the
  * difference between scanning one symbol's partitions and all of them.
  *
  * Two safe moves, both proved by the join's per-left-row semantics
  * (each output row depends only on its own left row and same-by right
  * rows):
  *  - deterministic conjuncts referencing only LEFT outputs push into the
  *    left child (dropping a left row early cannot affect any other row);
  *  - conjuncts over the BY keys additionally MIRROR to the right child
  *    with left attrs substituted by the right by-keys (right rows whose
  *    keys fail the predicate can only match left rows that were already
  *    dropped).
  */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (pushable, keep) = conjuncts.partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val byIndex = j.leftBy.map(_.exprId).zipWithIndex.toMap
        val lByAttrs = AttributeSet(j.leftBy)
        val mirrored: Seq[Expression] = pushable.collect {
          case p if p.references.subsetOf(lByAttrs) =>
            p.transform {
              case a: Attribute if byIndex.contains(a.exprId) =>
                j.rightBy(byIndex(a.exprId))
            }
        }
        val newLeft = Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), j.left)
        val newRight =
          if (mirrored.isEmpty) j.right
          else Filter(mirrored.reduce(org.apache.spark.sql.catalyst.expressions.And), j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        if (keep.isEmpty) pushed
        else Filter(keep.reduce(org.apache.spark.sql.catalyst.expressions.And), pushed)
      }
  }
}
