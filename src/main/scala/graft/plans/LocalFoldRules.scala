package graft.plans

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{IntegerLiteral, RowOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{Limit, LocalRelation, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Drive Sort and Limit over a small [[LocalRelation]] to completion at
  * OPTIMIZATION time — the missing siblings of Catalyst's own
  * `ConvertToLocalRelation` (which folds Project and Filter but leaves a
  * Sort or Limit behind, forcing `TakeOrderedAndProjectExec` /
  * `CollectLimitExec` to launch a real Spark job over a handful of
  * driver-held rows).
  *
  * Why it matters: the serving engine re-pins small registered tables as
  * LocalRelations (`Engine.registerResolved` — the reference's MemTable
  * model). An ad-hoc `SELECT ... WHERE ... ORDER BY ... LIMIT k` against
  * such a table then folds all the way to a single pre-computed
  * LocalRelation, and `executeCollect()` returns rows with NO job — the
  * measured cold-serving floor drops from ~30 ms (job scheduling) to
  * parse+plan time. Distributed tables never match the pattern, so the
  * rule is invisible at scale; the `cap` guards against sorting a
  * pathologically large union of local rows on the driver. */
object LocalFoldRules {

  private val cap = 65536

  /** Global Sort over a bounded LocalRelation -> pre-sorted LocalRelation
    * (stable sort with Spark's own row ordering, so semantics are
    * identical to SortExec's). */
  object FoldLocalSort extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case Sort(order, true, rel: LocalRelation, _)
          if rel.data.length <= cap && order.forall(_.deterministic) &&
            // a ScalarSubquery reports deterministic=true but is
            // Unevaluable until planning — sorting here would crash the
            // query at optimization time (review finding)
            !order.exists(_.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])) &&
            !rel.isStreaming =>
        val ordering = RowOrdering.create(order, rel.output)
        LocalRelation(rel.output, rel.data.sorted(ordering), isStreaming = false)
    }
  }

  /** Limit over a bounded LocalRelation -> truncated LocalRelation. */
  object FoldLocalLimit extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case Limit(IntegerLiteral(n), rel: LocalRelation)
          if rel.data.length <= cap && !rel.isStreaming =>
        LocalRelation(rel.output, rel.data.take(n), isStreaming = false)
    }
  }
}
