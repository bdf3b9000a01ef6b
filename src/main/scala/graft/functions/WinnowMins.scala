package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen-capable winnowing selection: the SORTED distinct minima of
  * every width-`w` sliding window over a hash array — the fingerprint
  * set of the MOSS winnowing algorithm. Value-equal (as a set) to the
  * interpreted `array_distinct(transform(sequence(1, n−w+1), p ->
  * array_min(slice(kg, p, w))))` formulation, but one O(n) pass with a
  * monotonic deque instead of n interpreted lambda dispatches each
  * allocating a w-slice; the sort makes the array order deterministic
  * (the HOF form's first-seen order is position-dependent — callers
  * explode anyway, so set equality is the contract).
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowMins.mins(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowMins.mins($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_mins"
}

object WinnowMins {

  /** Sorted distinct window minima; empty array when the input has
    * fewer than `w` elements.
    */
  def mins(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    // monotonic deque of indices; head is the current window's minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = h.getLong(i)
      while (tail > head && h.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(h.getLong(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def column(c: Column, w: Int): Column =
    GraftBridge.toColumn(new WinnowMins(GraftBridge.toExpression(c), w))
}
