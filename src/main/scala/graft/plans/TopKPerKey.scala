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
  * O(n log k) CPU, partial-stage memory hard-capped at `maxPartialKeys`
  * live heaps via evict-and-emit overflow (see [[TopKPerKeyExec]]'s
  * memory contract). At 100 TB top-k-per-key over a
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
    k: Int, maxPartialKeys: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"TopKPerKey requires k >= 1, got $k")
  require(keys.nonEmpty,
    "TopKPerKey requires at least one key; for a global top-k use orderBy(...).limit(k) " +
      "(TakeOrderedAndProject), which already has the bounded-shuffle property")
  require(maxPartialKeys >= 1, s"TopKPerKey requires maxPartialKeys >= 1, got $maxPartialKeys")
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
    case TopKPerKeyNode(keys, order, k, maxPartialKeys, child) =>
      TopKPerKeyExec(keys, order, k, maxPartialKeys, partial = false,
        TopKPerKeyExec(keys, order, k, maxPartialKeys, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heap top-k. `partial = true` runs on whatever
  * distribution the child has (map side); `partial = false` requires
  * the keys clustered, which EnsureRequirements satisfies with one hash
  * exchange (or zero if already clustered).
  *
  * Memory contract: the partial stage holds at most `maxPartialKeys`
  * live heaps — when a new key would exceed the cap, the eldest key's
  * heap is EVICTED AND EMITTED early. That is correct because partial
  * top-k is a combiner: the final stage merges however many partial
  * heaps a key produced (top-k of a union = top-k of the per-part
  * top-ks), so eviction only costs combine effectiveness (a few extra
  * shuffled rows for keys that recur after eviction), never rows. This
  * mirrors Spark's own partial-aggregation fallback-to-passthrough. The
  * final stage ignores the cap: its footprint is k rows per distinct
  * key of its partition — the size of its OUTPUT, the floor any
  * operator producing that result pays. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, maxPartialKeys: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
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
    val cap = if (partial) maxPartialKeys else Int.MaxValue
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
      // emit a heap's rows in sort order (poll order is reverse of it):
      // deterministic output, and downstream heaps rebuild cheaply
      def drain(heap: java.util.PriorityQueue[UnsafeRow]): Iterator[InternalRow] = {
        val arr = new Array[InternalRow](heap.size)
        var i = arr.length - 1
        while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
        arr.iterator
      }
      // streaming pass: admission returns nothing; a capacity eviction
      // (partial stage only) flushes the eldest key's heap downstream
      // immediately, keeping live heaps <= cap without buffering
      val evictions = iter.flatMap { r =>
        val row = toUnsafe(r) // reused buffer — copy on retain
        val key = keyProj(row) // reused buffer — copy on store
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.add(row.copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy())
            }
            Iterator.empty
          case None =>
            // PriorityQueue grows as needed — size the initial array for
            // the common small-group case, not for a large-k cap
            val heap = new java.util.PriorityQueue[UnsafeRow](math.min(kk, 16), heapOrd)
            heap.add(row.copy())
            heaps.put(key.copy(), heap)
            if (heaps.size > cap) {
              val eldest = heaps.head._1
              drain(heaps.remove(eldest).get)
            } else Iterator.empty
        }
      }
      evictions ++ heaps.valuesIterator.flatMap(drain)
    }, preservesPartitioning = true)
  }
}
