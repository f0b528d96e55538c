package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` leg of the extension taxonomy):
  * rewrites the ubiquitous ranked-top-k idiom
  *
  *   `Filter(rn <= k, Window([row_number() AS rn] over (partition, order)))`
  *
  * into the heap-based [[TopKPerGroupNode]], eliminating the full
  * per-partition sort (O(n log n) + full materialization) in favor of
  * bounded k-heaps (O(n log k), O(groups·k) memory) after the same key
  * shuffle. Deliberately conservative: fires only on the exact shape —
  * one window expression, it is `row_number`, the filter is a plain
  * `rn <= k` / `rn < k` directly above the window — so any other window
  * query is untouched. The rank attribute keeps the window alias's exprId,
  * leaving downstream references valid.
  *
  * Register builder-time via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or runtime via
  * [[TopKRewriteRule.enable]].
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** Spark's own InferWindowGroupLimit (an earlier optimizer batch) may
    * already have inserted a WindowGroupLimit below the window; the heap
    * operator subsumes that pruning WITHOUT the sort WindowGroupLimit
    * requires, so it is stripped. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case wgl: WindowGroupLimit => stripGroupLimit(wgl.child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (w.windowExpressions, cond) match {
        // Guards: a partition key must exist (ClusteredDistribution(Nil) is
        // rejected by the planner — a global top-k stays a window) and
        // k ≥ 1 (k=0 must keep the window plan's empty result).
        case (Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
              LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)))
            if a.semanticEquals(alias.toAttribute) && w.orderSpec.nonEmpty &&
              w.partitionSpec.nonEmpty && k >= 1 =>
          TopKPerGroupNode(k, w.partitionSpec, w.orderSpec, alias.toAttribute,
            stripGroupLimit(w.child))
        case (Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
              LessThan(a: AttributeReference, IntegerLiteral(k)))
            if a.semanticEquals(alias.toAttribute) && w.orderSpec.nonEmpty &&
              w.partitionSpec.nonEmpty && k > 1 =>
          TopKPerGroupNode(k - 1, w.partitionSpec, w.orderSpec, alias.toAttribute,
            stripGroupLimit(w.child))
        case _ => f
      }
  }

  /** Runtime enablement on an existing session (rule + the strategy that
    * plans the rewritten node). */
  def enable(spark: SparkSession): Unit = {
    TopKPerGroup.ensureRegistered(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
}
