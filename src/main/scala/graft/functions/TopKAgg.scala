package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst AGGREGATE: exact top-k values per group via a
  * bounded min-heap — `graft_topk(col, k)` → ARRAY<BIGINT> sorted
  * descending.
  *
  * The library's scalar hot paths are codegen Expressions; this is the
  * AGGREGATE counterpart (TypedImperativeAggregate): per-group state is
  * O(k) regardless of group size, and states MERGE, so grouped top-k
  * runs as one map-side-combined aggregation — no per-group window
  * sort, no rank filter, and at 100 TB no shuffle of anything but
  * k-element heaps. The window `row_number ≤ k` form shuffles and
  * sorts every row of every group (WindowGroupLimit prunes, but only
  * after a full exchange of survivors); this aggregate ships k longs
  * per group per map task.
  *
  * Semantics: the multiset of the k largest values (duplicates kept),
  * descending — identical to `ORDER BY v DESC LIMIT k` per group.
  */
case class TopKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[Long]]
    with UnaryLike[Expression] {

  require(k > 0, "graft_topk requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[Long] =
    new java.util.PriorityQueue[Long](k + 1)

  override def update(heap: java.util.PriorityQueue[Long], input: InternalRow)
      : java.util.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(a: java.util.PriorityQueue[Long], b: java.util.PriorityQueue[Long])
      : java.util.PriorityQueue[Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  private def add(heap: java.util.PriorityQueue[Long], v: Long): Unit =
    if (heap.size < k) heap.add(v)
    else if (v > heap.peek()) { heap.poll(); heap.add(v) }

  override def eval(heap: java.util.PriorityQueue[Long]): Any = {
    val out = new Array[Long](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    // descending
    var l = 0; var r = out.length - 1
    while (l < r) { val t = out(l); out(l) = out(r); out(r) = t; l += 1; r -= 1 }
    new GenericArrayData(out)
  }

  override def serialize(heap: java.util.PriorityQueue[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size * 8)
    buf.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add(buf.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_topk"
}

object TopKAgg {
  /** Column-API entry point (aggregate usage: `df.groupBy(...).agg(...)`). */
  def column(c: Column, k: Int): Column =
    GraftBridge.toColumn(TopKAgg(GraftBridge.toExpression(c), k).toAggregateExpression())
}
