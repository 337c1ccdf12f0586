package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
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
  require(k >= 1, s"topKPerGroup requires k >= 1, got $k")
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
      // two-stage, mirroring partial aggregation: a PARTIAL pass keeps
      // at most k rows per (group, input partition) map-side — no
      // distribution requirement, so it runs before the exchange the
      // FINAL node's ClusteredDistribution inserts. With a
      // low-cardinality group key (g groups over p partitions) the
      // final heap stage then touches <= g·p·k rows instead of the
      // whole input — without the partial pass, 3 groups means the
      // entire dataset funnels through <= 3 reducer tasks at any
      // cluster size. Top-k is a monoid (top-k of a union = top-k
      // of per-part top-ks), so the rewrite is output-identical.
      // The partial pass is ADAPTIVE (see doExecute): when a sampled
      // prefix shows it retaining nearly every row — a high-cardinality
      // group key, where map-side heaps prune nothing and only pay
      // copies — it abandons itself and streams rows straight to the
      // exchange, the same reduction-ratio fallback partial hash
      // aggregation applies.
      val partial = TopKPerGroupExec(k, group, order, rankAttr,
        planLater(child), partial = true)
      TopKPerGroupExec(k, group, order, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, group: Seq[Expression],
                            order: Seq[SortOrder], rankAttr: Attribute,
                            child: SparkPlan,
                            partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (group.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(group) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    // retained-row bound per partition before heaps spill to a sorted
    // run on local disk; memory is O(threshold + k·runs) instead of
    // O(groups·k), so a high-cardinality group key cannot OOM the task
    val spillThreshold =
      conf.getConfString("spark.graft.topk.spillThreshold", "262144").toInt
    // adaptive-partial knobs: after `sampleRows` input rows, a partial
    // pass that kept more than `maxKeepRatio` of them is not pruning
    // (group cardinality ~ row count) and abandons itself
    val sampleRows =
      conf.getConfString("spark.graft.topk.partialSampleRows", "4096").toInt
    val maxKeepRatio =
      conf.getConfString("spark.graft.topk.partialMaxKeepRatio", "0.875").toDouble
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(group, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(order, childOutput)
      // per group: bounded heap of the k best rows; PriorityQueue
      // dequeues the MAX per `ordering` (ascending = better-first), so
      // head is the worst kept row — exactly the eviction candidate
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val spills = mutable.ArrayBuffer.empty[java.io.File]
      var retained = 0

      // drain the heap map into one run file sorted by key bytes
      // (byte-lexicographic is a total order consistent with UnsafeRow
      // equality for a fixed projection — any order shared by all runs
      // works for the merge)
      def spill(): Unit = {
        val entries = heaps.toArray.sortWith { case ((a, _), (b, _)) =>
          java.util.Arrays.compare(a.getBytes, b.getBytes) < 0
        }
        val f = java.io.File.createTempFile("graft-topk-spill-", ".run")
        f.deleteOnExit()
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        try {
          entries.foreach { case (key, heap) =>
            val kb = key.getBytes
            out.writeInt(kb.length); out.write(kb)
            val rows = heap.dequeueAll.reverse // best-first
            out.writeInt(rows.length)
            rows.foreach { r =>
              val rb = rowProj(r).getBytes
              out.writeInt(rb.length); out.write(rb)
            }
          }
          out.writeInt(-1) // end-of-run marker
        } finally out.close()
        spills += f
        heaps.clear()
        retained = 0
      }

      var seen = 0
      var abandoned = false
      while (it.hasNext && !abandoned) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < k) {
          heap.enqueue(row.copy())
          retained += 1
          if (retained > spillThreshold) spill()
        } else if (ordering.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
        seen += 1
        // spills.isEmpty guards a configured spillThreshold below the
        // sample size: abandoning after a spill would drop spilled rows
        if (partial && seen == sampleRows && spills.isEmpty &&
            retained > seen * maxKeepRatio) abandoned = true
      }

      // partial mode forwards the surviving rows unranked (the final
      // pass re-ranks after the merge); final mode appends the rank
      val emit: Seq[InternalRow] => Iterator[InternalRow] =
        if (partial) { rows => rows.iterator.map(rowProj) }
        else {
          val resultProj = UnsafeProjection.create(output, childOutput :+ rankAttr)
          val joined = new JoinedRow
          rows => rows.iterator.zipWithIndex.map { case (row, i) =>
            resultProj(joined(row, new GenericInternalRow(Array[Any](i + 1))))
          }
        }

      if (abandoned) {
        // the sampled prefix kept > maxKeepRatio of its rows: map-side
        // heaps are pure overhead here (one group ~ one row per
        // partition) — flush what's buffered unranked and stream the
        // remainder straight through to the exchange; the final pass
        // computes the identical result either way. Reached only with
        // zero spills, so the buffered heaps are the complete prefix.
        heaps.iterator.flatMap(_._2.iterator).map(rowProj) ++ it.map(rowProj)
      } else if (spills.isEmpty) {
        // in-memory fast path
        heaps.iterator.flatMap { case (_, heap) =>
          emit(heap.dequeueAll.reverse)
        }
      } else {
        spill() // final in-memory batch becomes the last run
        // merge the key-sorted runs: each group appears in <= #runs
        // runs with <= k rows per run; combine and re-select top k one
        // group at a time — memory O(runs · k)
        final class Run(f: java.io.File) {
          private val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
          var key: Array[Byte] = _
          var rows: Array[InternalRow] = _
          advance()
          def advance(): Unit = {
            val klen = in.readInt()
            if (klen < 0) { key = null; rows = null; in.close(); f.delete() }
            else {
              key = new Array[Byte](klen); in.readFully(key)
              rows = Array.fill(in.readInt()) {
                val rb = new Array[Byte](in.readInt()); in.readFully(rb)
                val r = new UnsafeRow(childOutput.length)
                r.pointTo(rb, rb.length)
                r: InternalRow
              }
            }
          }
        }
        val runs = spills.map(new Run(_)).filter(_.key != null)
        val byKey: Ordering[Run] =
          (a: Run, b: Run) => java.util.Arrays.compare(a.key, b.key)
        val pq = mutable.PriorityQueue.empty[Run](byKey.reverse) // min-heap
        runs.foreach(pq.enqueue(_))
        new Iterator[Seq[InternalRow]] {
          override def hasNext: Boolean = pq.nonEmpty
          override def next(): Seq[InternalRow] = {
            val first = pq.dequeue()
            val headKey = first.key
            val combined = mutable.ArrayBuffer.empty[InternalRow]
            combined ++= first.rows
            first.advance()
            if (first.key != null) pq.enqueue(first)
            while (pq.nonEmpty &&
                   java.util.Arrays.compare(pq.head.key, headKey) == 0) {
              val r = pq.dequeue()
              combined ++= r.rows
              r.advance()
              if (r.key != null) pq.enqueue(r)
            }
            combined.sorted(ordering).take(k).toSeq
          }
        }.flatMap(emit)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
