package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** collect_list with a hard per-group element bound — the memory-safe
  * aggregate under the round-8 grouped-bucket candidate shape
  * (§18.22/§18.23): a degenerate bucket key (corpus-wide boilerplate
  * shingle, an all-identical signature band) otherwise materializes
  * its ENTIRE membership as one array row inside the aggregation
  * buffer — at 100 TB that is a multi-GB single row and an executor
  * OOM, the same clique pathology the old count-based anti-join
  * (capBuckets) was immune to. This buffer stops growing at cap + 1
  * elements (update and merge both bound it), so worst-case memory
  * per group is cap + 1 elements regardless of occupancy, while:
  *  - groups with occupancy ≤ cap keep their COMPLETE list (callers
  *    filter on a side-by-side count(1) column, whose value is the
  *    TRUE occupancy even when the list is truncated), and
  *  - over-cap groups are detectable (count > cap) and dropped (the
  *    banding paths) or routed to a membership semi-join (the ngram
  *    oc path) without their list ever being built.
  *
  * Extends Spark's own Collect base (the CollectList machinery:
  * buffer conversion, serialize/deserialize), overriding only the
  * growth sites. Declarative-surface note: this is intentionally an
  * AGGREGATE bound, not `slice(collect_list(...), 1, cap)` — the
  * slice form builds the full list first, which is the exact failure.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cap >= 1 && cap < Int.MaxValue, s"cap must be in [1, MaxInt), got $cap")

  private val limit = cap + 1

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length < limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = "bounded_collect_list"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectList = copy(child = newChild)
}

object BoundedCollectList {
  /** Column-level helper: bounded doc-list aggregate. */
  def agg(child: org.apache.spark.sql.Column, cap: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      BoundedCollectList(
        org.apache.spark.sql.GraftExpressionBridge.expression(child),
        cap).toAggregateExpression())
}
