package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.{PercentileDigest, PercentileDigestSerializer}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable per-group quantile sketches — the quantile counterpart of
  * the `hll_sketch_agg` / `hll_union_agg` pair (q36_hll_union's
  * pattern), built on Spark's own Greenwald–Khanna summary
  * (`ApproximatePercentile.PercentileDigest`, the state behind
  * `percentile_approx`) which Spark exposes as an aggregate RESULT but
  * not as a reusable sketch COLUMN:
  *
  *  - `graft_qsketch(v, accuracy)`        AGGREGATE → BINARY sketch
  *  - `graft_qsketch_merge(sk)`           AGGREGATE → BINARY merged sketch
  *  - `graft_qsketch_quantile(sk, p)`     scalar    → DOUBLE estimate
  *
  * Why it matters at 100 TB: a per-(key, period) sketch table is tiny
  * and append-only; any coarser rollup (month → quarter → year, region
  * → global) is a cheap sketch MERGE instead of a re-scan of raw
  * history — the same economics q36 buys for distinct counts, here for
  * p50/p90/p99. Per-group state is O(1/ε·log(εN)) regardless of group
  * size and states merge associatively, so the aggregation is map-side
  * combinable end to end.
  *
  * Error contract (GK): a queried quantile p is some exact value whose
  * RANK lies within ±ε·n of p·n, ε = 1/accuracy — the spec bounds the
  * estimate between the exact (p−ε) and (p+ε) quantiles. Estimates are
  * engine-specific → driver queries using these are declared rows-only,
  * like every sketch op.
  */
case class QuantileSketchAgg(child: Expression, accuracy: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PercentileDigest]
    with UnaryLike[Expression] {

  require(accuracy > 0, "graft_qsketch requires accuracy > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0d / accuracy)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: PercentileDigest, b: PercentileDigest): PercentileDigest = {
    a.merge(b)
    a
  }

  override def eval(buf: PercentileDigest): Any = QuantileSketch.ser.serialize(buf)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    QuantileSketch.ser.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    QuantileSketch.ser.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_qsketch"
}

/** Union-merge of serialized quantile sketches (the `hll_union_agg`
  * analogue): BINARY sketches in, one merged BINARY sketch out.
  * Sketches produced at different accuracies merge to the coarser
  * error bound (GK merge adds the operands' ε); keep one accuracy per
  * sketch table.
  */
case class QuantileSketchMergeAgg(child: Expression, accuracy: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PercentileDigest]
    with UnaryLike[Expression] {

  require(accuracy > 0, "graft_qsketch_merge requires accuracy > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY sketch input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0d / accuracy)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.merge(QuantileSketch.ser.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: PercentileDigest, b: PercentileDigest): PercentileDigest = {
    a.merge(b)
    a
  }

  override def eval(buf: PercentileDigest): Any = QuantileSketch.ser.serialize(buf)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    QuantileSketch.ser.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    QuantileSketch.ser.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_qsketch_merge"
}

/** Scalar read of a serialized sketch: the estimated p-quantile.
  * Interpreted eval is fine here — it runs once per GROUP row (sketch
  * tables are aggregate-cardinality), never per data row.
  */
case class QuantileSketchQuantile(child: Expression, percentage: Double)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(percentage >= 0.0 && percentage <= 1.0,
    "graft_qsketch_quantile requires 0 <= p <= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY sketch input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val digest = QuantileSketch.ser.deserialize(v.asInstanceOf[Array[Byte]])
      val out = digest.getPercentiles(Array(percentage))
      if (out.isEmpty) null else out.head
    }
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileSketchQuantile =
    copy(child = newChild)

  override def prettyName: String = "graft_qsketch_quantile"
}

object QuantileSketch {
  private[functions] val ser = new PercentileDigestSerializer

  /** percentile_approx's default accuracy; ε = 1/accuracy rank error. */
  val DefaultAccuracy = 10000

  def sketch(c: Column, accuracy: Int = DefaultAccuracy): Column =
    GraftBridge.toColumn(
      QuantileSketchAgg(GraftBridge.toExpression(c), accuracy).toAggregateExpression())

  def merge(c: Column, accuracy: Int = DefaultAccuracy): Column =
    GraftBridge.toColumn(
      QuantileSketchMergeAgg(GraftBridge.toExpression(c), accuracy).toAggregateExpression())

  def quantile(c: Column, p: Double): Column =
    GraftBridge.toColumn(QuantileSketchQuantile(GraftBridge.toExpression(c), p))
}
