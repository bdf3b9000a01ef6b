package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-capable polynomial rolling hash over a string's Unicode code
  * points: acc := (acc·mult + codepoint) mod P, P = 2^31-1.
  *
  * Semantically identical to the interpreted
  * `aggregate(transform(split(s, ""), ascii), ...)` formulation (and to
  * the DuckDB `list_reduce` oracle fragment in [[TextFns.charFoldSql]]),
  * but runs as a single pass over the UTF-8 bytes inside whole-stage
  * codegen — no per-character array allocation, no interpreted lambda.
  * This is the hot primitive of the dedup/fingerprint family: at corpus
  * scale it runs at parquet scan speed.
  */
case class PolyCharFold(child: Expression, mult: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyCharFold.fold(input.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyCharFold.fold($c, ${mult}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyCharFold =
    copy(child = newChild)

  override def prettyName: String = "graft_charfold"
}

object PolyCharFold {
  final val P = 2147483647L

  /** One pass over the UTF-8 bytes, decoding code points inline. */
  def fold(s: UTF8String, mult: Long): Long = {
    val b = s.getBytes
    var acc = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      var cp = 0
      if (c < 0x80) { cp = c; i += 1 }
      else if (c < 0xe0) { cp = ((c & 0x1f) << 6) | (b(i + 1) & 0x3f); i += 2 }
      else if (c < 0xf0) {
        cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f); i += 3
      } else {
        cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f); i += 4
      }
      acc = (acc * mult + cp) % P
    }
    acc
  }

  /** Column-API entry point. */
  def column(c: Column, mult: Long): Column =
    GraftBridge.toColumn(new PolyCharFold(GraftBridge.toExpression(c), mult))
}
