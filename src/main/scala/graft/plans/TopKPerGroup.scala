package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * events. For extreme group counts (the heap map itself is the memory
  * risk) a partition falls back to a spill-capable external sort +
  * streaming first-k scan — bound via `spark.graft.topk.maxGroupsInMemory`.
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

  /** The child was just hash-partitioned on the group key; advertise it so
    * a downstream operator clustering on the same key doesn't insert a
    * redundant Exchange. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val orders = sortOrders
    val outAttrs = output
    val childSchema =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(childOutput)
    // heap-map bound: above this many groups per partition the map itself
    // is the memory risk (heaps hold groups·k rows un-spillable), so the
    // partition falls back to a spill-capable external sort + streaming
    // first-k-per-key scan. Default sized for ~100s of MB of keys.
    val maxGroups = conf.getConfString("spark.graft.topk.maxGroupsInMemory",
      (4 << 20).toString).toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(orders, childOutput)
      val outProj = UnsafeProjection.create(outAttrs.map(a => a: Expression), outAttrs)
      val joined = new JoinedRow
      def emit(row: InternalRow, rank: Int): InternalRow =
        outProj(joined(row, new GenericInternalRow(Array[Any](rank))))
      // max-heap per group: head = current worst of the kept k
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      implicit val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b)
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[UnsafeRow])
        if (heap.size < kLocal) {
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
        if (heaps.size > maxGroups) overflowed = true
      }
      if (!overflowed) {
        heaps.iterator.flatMap { case (_, heap) =>
          val bestFirst: Seq[UnsafeRow] = heap.dequeueAll.reverse
          bestFirst.iterator.zipWithIndex.map { case (row, i) => emit(row, i + 1) }
        }
      } else {
        // ---- sort fallback: (group key, sort order) external sort with
        // spill (the same machinery SortExec uses), then a streaming scan
        // that emits the first k rows of each key run — O(1) heap memory
        // regardless of group count.
        val allOrders = partExprs.map(e => SortOrder(e, Ascending)) ++ orders
        val fullOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(allOrders, childOutput)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          childSchema, fullOrdering, PrefixComparators.LONG, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        heaps.valuesIterator.flatMap(_.iterator)
          .foreach(r => sorter.insertRow(r))
        heaps.clear()
        while (iter.hasNext) {
          sorter.insertRow(iter.next().asInstanceOf[UnsafeRow])
        }
        var prevKey: UnsafeRow = null
        var rank = 0
        sorter.sort().flatMap { row =>
          val key = keyProj(row)
          if (prevKey == null || key != prevKey) { prevKey = key.copy(); rank = 0 }
          rank += 1
          if (rank <= kLocal) Some(emit(row, rank)) else None
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
