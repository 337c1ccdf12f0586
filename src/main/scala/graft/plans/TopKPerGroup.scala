package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

import scala.collection.mutable

/** Custom whole-operator: bounded top-k per group
  * (SURVEY.md §2.5 W4 / §2.6 O3 — the reference keeps the best
  * MAX_DOM_BY_GROUP=20 domains per overlap group,
  * interpro/oracle/matches.py:136-141).
  *
  * The DataFrame formulation (`row_number().over(window) <= k`) sorts
  * every partition fully: O(n log n) over ALL rows, with the whole
  * partition materialized in the sorter. This operator keeps one
  * bounded heap of k rows per group: O(n log k), memory O(groups·k) —
  * the difference between sorting 10^9 match rows and heap-sifting
  * them at 100 TB.
  *
  * Three pieces, all registered through SparkSessionExtensions:
  * logical node (below), planner strategy (TopKPerGroupStrategy),
  * physical exec (TopKPerGroupExec) that declares
  * ClusteredDistribution so Catalyst inserts exactly one hash shuffle
  * on the group keys.
  */
case class LocalTopKPerGroup(k: Int, group: Seq[Expression],
                             order: Seq[SortOrder],
                             rankAttr: AttributeReference,
                             child: LogicalPlan) extends UnaryNode {
  // rankAttr is a constructor param (not a body val) so the exprId is
  // stable across analyzer/optimizer copies of the node
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalTopKPerGroup =
    copy(child = newChild)
}

object LocalTopKPerGroup {
  def apply(k: Int, group: Seq[Expression], order: Seq[SortOrder],
            rankName: String, child: LogicalPlan): LocalTopKPerGroup =
    LocalTopKPerGroup(k, group, order,
      AttributeReference(rankName, IntegerType, nullable = false)(), child)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopKPerGroup(k, group, order, rankAttr, child) =>
      TopKPerGroupExec(k, group, order, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, group: Seq[Expression],
                            order: Seq[SortOrder], rankAttr: Attribute,
                            child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) AllTuples :: Nil else ClusteredDistribution(group) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(group, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(order, childOutput)
      // per group: bounded heap of the k best rows; PriorityQueue
      // dequeues the MAX per `ordering` (ascending = better-first), so
      // head is the worst kept row — exactly the eviction candidate
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < k) heap.enqueue(row.copy())
        else if (ordering.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val resultProj = UnsafeProjection.create(output, childOutput :+ rankAttr)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val best: Seq[InternalRow] = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (row, i) =>
          resultProj(joined(row, new GenericInternalRow(Array[Any](i + 1))))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
