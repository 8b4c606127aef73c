package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key as a first-class operator (SURVEY.md §2/§8
  * escalation ladder step (c): custom LogicalPlan + SparkStrategy +
  * SparkPlan — the one tier below a full planner fork).
  *
  * WHY a custom operator when `row_number().over(partitionBy(key)
  * .orderBy(o)) <= k` expresses the same result: the window plan must
  * shuffle EVERY row to its key's partition and then full-sort each
  * partition — O(corpus) shuffle bytes and O(n log n) per-partition CPU
  * with full materialization. This operator is aggregation-shaped
  * instead: a PARTIAL stage keeps a bounded k-row heap per key within
  * each input partition, so the exchange carries at most
  * k · keys-per-task rows (the map-side-combine property joins and
  * windows lack), and the FINAL stage merges heaps after the shuffle —
  * O(n log k) CPU, memory bounded by k rows per live key exactly like a
  * partial hash aggregate's map. At 100 TB top-k-per-key over a
  * billion-row corpus with thousands of keys shuffles k·keys rows
  * instead of the corpus.
  *
  * Semantics: emits exactly min(k, |group|) rows per distinct key — the
  * first k under the given SortOrder. Callers wanting deterministic
  * output must make the order total (unique tiebreak), same contract as
  * rank-based SQL. Rows pass through unchanged (output = child.output).
  *
  * Plan shape (asserted in TopKSpec): partial TopKPerKeyExec → one hash
  * exchange on the keys (inserted by EnsureRequirements; elided
  * entirely if the child is already clustered) → final TopKPerKeyExec.
  * No Sort node anywhere. The exec is doExecute-only (it breaks a
  * whole-stage-codegen span the way every blocking operator does);
  * the per-row work is one codegen'd key projection + one codegen'd
  * ordering comparison.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"TopKPerKey requires k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial + final [[TopKPerKeyExec]];
  * registered per-session via `spark.experimental.extraStrategies`
  * (public API — see graft.api.TopK). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heap top-k. `partial = true` runs on whatever
  * distribution the child has (map side); `partial = false` requires
  * the keys clustered, which EnsureRequirements satisfies with one hash
  * exchange (or zero if already clustered). */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      // all three are codegen'd (with interpreted fallback) and created
      // once per task, not per row
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // "first k under ord" = k smallest; the heap keeps its LARGEST
      // kept row at the head (reverse ordering) so one peek decides
      // admission. Ordering[InternalRow] IS a java Comparator.
      val heapOrd = ord.reverse.asInstanceOf[java.util.Comparator[UnsafeRow]]
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]
      while (iter.hasNext) {
        val row = toUnsafe(iter.next()) // reused buffer — copy on retain
        val key = keyProj(row)          // reused buffer — copy on store
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) { heap.add(row.copy()); () }
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy()); ()
            }
          case None =>
            val heap = new java.util.PriorityQueue[UnsafeRow](kk, heapOrd)
            heap.add(row.copy())
            heaps.put(key.copy(), heap)
            ()
        }
      }
      // emit each key's rows in sort order (poll order is reverse of it):
      // deterministic output, and the final stage's heaps rebuild cheaply
      heaps.valuesIterator.flatMap { heap =>
        val arr = new Array[InternalRow](heap.size)
        var i = arr.length - 1
        while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
        arr
      }
    }, preservesPartitioning = true)
  }
}
