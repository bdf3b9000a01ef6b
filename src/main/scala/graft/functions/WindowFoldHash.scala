package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen-capable POSITION-PRESERVING k-token window hash sequence:
  * out[i] = fold(acc = 0; acc = (acc·131 + tokenHash[i+j]) mod (2^31−1))
  * over j < k — the sliding-window fingerprint the exact-substring
  * dedup pass ([[graft.operators.Dedup.exactSpansOn]]) matches across
  * the corpus. Same fold arithmetic as [[PolyCharFold]]'s character
  * fold and the 3-gram shingle composition, generalized to an
  * arbitrary window width; intermediates stay < 2^39, exactly
  * reproducible in the DuckDB oracle's `list_reduce` twin
  * ([[TextFns.windowFoldHashesSql]]). One fused compiled loop
  * (O(tokens·k) with zero boxing) instead of an interpreted
  * nested-lambda `transform(…, aggregate(slice(…)))`, which gets no
  * codegen and re-boxes every element.
  * Returns an empty array when the doc has fewer than k tokens.
  */
case class WindowFoldHash(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WindowFoldHash.windows(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowFoldHash.windows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowFoldHash =
    copy(child = newChild)

  override def prettyName: String = "graft_window_fold_hash"
}

object WindowFoldHash {
  final val P = 2147483647L

  def windows(h: ArrayData, k: Int): ArrayData = {
    val n = h.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 131L + h.getLong(i + j)) % P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def column(c: Column, k: Int): Column =
    GraftBridge.toColumn(new WindowFoldHash(GraftBridge.toExpression(c), k))
}
