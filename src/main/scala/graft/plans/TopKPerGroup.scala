package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator extension (SURVEY §4.2 ladder rung c): top-K rows per
  * group as a first-class operator — LogicalPlan node, planner Strategy,
  * physical exec — instead of the `row_number().over(window) <= k`
  * pattern, which sorts every group in full.
  *
  * Physical shape mirrors partial/final aggregation:
  *   partial TopKExec (per input partition, bounded heaps, no shuffle)
  *     -> shuffle on the group key (≤ k rows per group per partition —
  *        the heap is the "map-side combine")
  *   final TopKExec (exact per-group top-K)
  *
  * Memory is O(groups × k) per task regardless of group size — a
  * billion-row group costs the same heap as a thousand-row group, which
  * is the property that matters at 100 TB.
  */
case class TopKPerGroup(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup = copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(grouping) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = grouping
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // codegen'd row comparator for the SortOrder sequence
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap under the sort order: head = worst retained row, evicted
      // when a better row arrives and the heap is full
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ordering.on((r: UnsafeRow) => r))
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec = copy(child = c)
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"
}

object TopKPerGroupOps {

  /** Sort spec: column name + direction. (Plain data, not Column — the
    * Spark 4 Column sort node is a lazy non-serializable wrapper, so we
    * build catalyst SortOrder directly.) */
  case class Sort(name: String, desc: Boolean = false)

  /** DataFrame API: top `k` rows per group of `groupCols` under `orderBy`.
    * Output order is unspecified — sort after if needed. Registers the
    * planner strategy on the session (idempotent). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Sort], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${child.output.map(_.name)}"))
    val grouping = groupCols.map(attr)
    val order = orderBy.map { s =>
      SortOrder(attr(s.name), if (s.desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark, TopKPerGroup(grouping, order, k, child))
  }
}
