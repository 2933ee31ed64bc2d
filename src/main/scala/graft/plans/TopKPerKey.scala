package graft.plans

import java.util.{HashMap => JHashMap, PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator custom Catalyst plan (SURVEY §4.4 mechanism (c)):
  * top-k rows per key, executed as two bounded-heap phases instead of the
  * `Window(row_number) + Filter` plan Spark produces for the same query.
  *
  * Why a physical operator: the window form must SORT every partition's
  * full data (shuffle all rows, then `O(n log n)` per partition, spilling
  * at scale) to discard all but k rows per key. The heap form is the
  * aggregation shape: a map-side pass keeps ≤ k rows per key per input
  * partition in `O(n log k)` with NO sort, the shuffle then carries at
  * most `k · |keys| · inputPartitions` rows — for the typical "top 3 per
  * category over billions of rows" this is orders of magnitude less data
  * moved — and the final phase merges the per-partition survivors. It is
  * exactly partial/final aggregation where the aggregate buffer is a
  * bounded heap of whole rows.
  *
  * Semantics: the row-SET of `row_number() OVER (PARTITION BY keys ORDER
  * BY order) <= k` for a total (tie-free) `order`; output order within
  * a key is unspecified, like any aggregation.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  require(keys.nonEmpty, "top-k per key needs at least one key")
  // rank-preserving form: emit the 1..k position under `order` as one
  // extra column (the attribute — same exprId — the rewritten window's
  // row_number alias bound, so parents resolve unchanged)
  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKey → partial exec (any distribution)
  * under final exec (clustered on keys). EnsureRequirements inserts the
  * hash exchange between them, the same way partial/final aggregation
  * plans — so AQE still coalesces/rebalances that shuffle normally.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, rankAttr) =>
      // only the final phase ranks: partial survivors are per-input-
      // partition candidates whose position is not yet meaningful
      val partial =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial, rankAttr) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key over one partition stream. Keeps, per key,
  * a size-≤k max-heap under the requested ordering (heap root = worst
  * survivor); a new row either fits (heap not full) or replaces the root
  * iff it orders strictly before it. Rows and keys are copied on
  * retention — the input iterator reuses its UnsafeRows.
  *
  * Memory: O(|distinct keys in partition| · k · rowSize), the same bound
  * a hash aggregation over these keys carries. No sort, no spill files;
  * a key explosion should be handled upstream the way it is for hash
  * aggregation (more partitions).
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    val rank = rankAttr.isDefined
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: Ordering[InternalRow] = RowOrdering.create(sortOrder, childOutput)
      val heaps = new JHashMap[UnsafeRow, JPriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // reverse ordering ⇒ java max-heap w.r.t. the requested order
          heap = new JPriorityQueue[InternalRow](limit + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      if (rank) {
        // rank-preserving emit: k is small, so sorting each key's ≤k
        // survivors is O(k log k) per key — still no partition-wide sort.
        // Downstream consumers (collect, shuffle writers) require
        // UnsafeRow, so the joined (row, rank) is run through an unsafe
        // projection; buffers are reused per Spark operator convention.
        val toUnsafe = UnsafeProjection.create(
          (childOutput.map(_.dataType) :+
            org.apache.spark.sql.types.IntegerType).toArray)
        val rankCell = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { h =>
          numOutputRows += h.size()
          val rows = h.iterator().asScala.toArray.sorted(ord)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankCell.setInt(0, i + 1)
            toUnsafe(joined(r, rankCell))
          }
        }
      } else {
        heaps.values().iterator().asScala.flatMap { h =>
          numOutputRows += h.size()
          h.iterator().asScala
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
