package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator extension (SparkSessionExtensions ladder step (c)):
  * top-k rows per group in a given sort order, WITHOUT sorting whole
  * groups.
  *
  * The built-in way to express this — `row_number().over(partitionBy
  * (g).orderBy(o)) <= k` — shuffles every row of every group and then
  * SORTS each whole group, O(n log n) per group, to keep k rows. This
  * operator plans two physical stages, the classic partial/final agg
  * shape:
  *
  *  - partial: per input partition, one bounded heap per group — at
  *    most k rows per (group, partition) survive, so the shuffle
  *    carries O(groups × k × partitions-that-saw-the-group), not n;
  *  - final: declares `ClusteredDistribution(group)` (Spark inserts
  *    the hash exchange), merges the partial heaps, emits each group's
  *    k rows in sort order.
  *
  * At 100 TB this is the difference between shuffling+sorting the full
  * fact table per window and shuffling k rows per group. The sort
  * order must be total (include a tiebreak column) for deterministic
  * results — same contract as the window form.
  */
case class GroupTopK(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "GroupTopK requires k > 0")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

object GroupTopK {

  /** `topK(df, groupCols, k, orderCols…)` — top-k rows per group. Plain
    * Columns order ascending; use `.desc`/`.asc` for explicit
    * direction. Registers the planner strategy on the DataFrame's
    * session (idempotent). */
  def topK(df: DataFrame, groupCols: Seq[Column], k: Int,
      orderCols: Column*): DataFrame = {
    val session = df.sparkSession
    if (!session.experimental.extraStrategies.contains(GroupTopKStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ GroupTopKStrategy
    val order = orderCols.map(c => ColumnBridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val node = GroupTopK(groupCols.map(ColumnBridge.expression), order, k,
      df.queryExecution.analyzed)
    ColumnBridge.ofRows(session, node)
  }

  /** topK + a 1-based rank column: the rank window runs over the ≤ k
    * survivors per group (already clustered by the final stage), not
    * the full input — ranks are identical to a full window-rank filter
    * because the survivors are exactly ranks 1..k. */
  def topKRanked(df: DataFrame, groupCols: Seq[Column], k: Int,
      rankName: String, orderCols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    topK(df, groupCols, k, orderCols: _*)
      .withColumn(rankName, row_number().over(w).cast("long"))
  }
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(g, s, k, child) =>
      val partial = GroupTopKExec(g, s, k, planLater(child), partial = true)
      GroupTopKExec(g, s, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder], k: Int, child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def nodeName: String =
    if (partial) "GroupTopKPartial" else "GroupTopKFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = sortOrder
    val groupLocal = groupExprs
    val childOutput = child.output
    val emitSorted = !partial
    child.execute().mapPartitions { it =>
      // ordering "a before b" = a belongs earlier in the output; the
      // max-heap keeps the k earliest rows (head = current worst)
      val ord = new LazilyGeneratedOrdering(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            val h = groups.next()
            current =
              if (emitSorted) h.dequeueAll.reverseIterator // heap pops worst-first
              else h.iterator
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
