package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (the SURVEY.md §7 preference ladder's step (c)):
  * ranked top-k rows per group as a first-class plan node —
  * `LogicalPlan` + `Strategy` + `SparkPlan` — instead of the
  * window-function formulation (`row_number().over(...)` + filter).
  *
  * Why a custom operator: the window plan must SORT every partition fully
  * (O(n log n) per group, all rows materialized in the sort buffer) before
  * discarding all but k rows. This node keeps one bounded k-heap per group
  * (O(n log k), O(groups·k) memory) after the single key shuffle that the
  * window needs anyway. Same exchange, strictly less work after it — the
  * kind of win that matters when "group" is a user and n is 100 TB of
  * events. (Production hardening would add spill-to-disk for extreme group
  * counts; the window formulation remains the fallback.)
  */
case class TopKPerGroupNode(
    k: Int,
    partitionExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    k: Int,
    partitionExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** One hash shuffle on the group key — same requirement a window would
    * impose, minus the full sort. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val orders = sortOrders
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(orders, childOutput)
      // max-heap per group: head = current worst of the kept k
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      implicit val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b)
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[UnsafeRow])
        if (heap.size < kLocal) {
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      val outProj = UnsafeProjection.create(outAttrs.map(a => a: Expression), outAttrs)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val bestFirst: Seq[UnsafeRow] = heap.dequeueAll.reverse
        bestFirst.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, new GenericInternalRow(Array[Any](i + 1)))): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, parts, orders, rank, child) =>
      TopKPerGroupExec(k, parts, orders, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Idempotent runtime strategy injection (builder-time path:
    * `withExtensions(_.injectPlannerStrategy(_ => TopKStrategy))`). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Ranked top-k rows per group. `orderBy` is (column, ascending). The
    * appended rank column is `rankName` (1-based, dense within group). */
  def apply(df: DataFrame, k: Int, partitionCols: Seq[String],
      orderBy: Seq[(String, Boolean)], rankName: String = "rn"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(partitionCols.nonEmpty,
      "at least one partition column required (global top-k: use orderBy+limit)")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val parts = partitionCols.map(c => GraftColumnBridge.expression(df(c)))
    val orders = orderBy.map { case (c, asc) =>
      SortOrder(GraftColumnBridge.expression(df(c)), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftColumnBridge.ofRows(spark,
      TopKPerGroupNode(k, parts, orders, rank, df.queryExecution.analyzed))
  }
}
