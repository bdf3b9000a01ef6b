package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-capable single-pass text counters over a string's UTF-8
  * bytes. `mode` selects what is counted:
  *
  *  - [[TextCount.Words]]: maximal non-whitespace runs — identical to
  *    `size(filter(split(lower(trim(s)), "\\s+"), w => w =!= ""))`
  *    (case-folding and trimming don't change run counts).
  *  - [[TextCount.NonWs]]: non-whitespace code points — identical to
  *    `aggregate(words, 0, (a, w) -> a + length(w))` over the same
  *    tokens, since every non-whitespace code point lands in exactly
  *    one token.
  *  - [[TextCount.Punct]]: code points in the class [.!?,;:] —
  *    identical to `length(regexp_replace(s, "[^.!?,;:]", ""))`.
  *
  * These replace the interpreted `aggregate` higher-order lambda and a
  * per-row regex pass on text_quality's hot path (the slowest scan-side
  * op of round 1) with tight whole-stage-codegen loops; the DuckDB
  * oracle fragments are unchanged because the counted values are
  * identical. Whitespace is the ASCII \s class Spark's `split` uses
  * (space, \t, \n, \x0B, \f, \r).
  */
case class TextCount(child: Expression, mode: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextCount.count(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCount.count($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): TextCount =
    copy(child = newChild)

  override def prettyName: String = "graft_text_count"
}

object TextCount {
  final val Words = 0
  final val NonWs = 1
  final val Punct = 2

  /** One pass over the UTF-8 bytes, decoding code points inline
    * (PolyCharFold's loop shape); all three counters are maintained and
    * `mode` selects the result.
    */
  def count(s: UTF8String, mode: Int): Long = {
    val b = s.getBytes
    var words = 0L
    var nonws = 0L
    var punct = 0L
    var inWord = false
    var i = 0
    val n = b.length
    // continuation reads clamp at n: the function is SQL-registered, so
    // truncated/invalid multi-byte sequences from arbitrary user input
    // (casts from binary, corrupt sources) must degrade — count what
    // decodes and stop — not throw ArrayIndexOutOfBounds and fail the
    // whole stage
    @inline def cont(j: Int): Int = if (j < n) b(j) & 0x3f else 0
    while (i < n) {
      val c = b(i) & 0xff
      var cp = 0
      if (c < 0x80) { cp = c; i += 1 }
      else if (c < 0xe0) { cp = ((c & 0x1f) << 6) | cont(i + 1); i += 2 }
      else if (c < 0xf0) {
        cp = ((c & 0x0f) << 12) | (cont(i + 1) << 6) | cont(i + 2); i += 3
      } else {
        cp = ((c & 0x07) << 18) | (cont(i + 1) << 12) |
          (cont(i + 2) << 6) | cont(i + 3); i += 4
      }
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'
      if (ws) inWord = false
      else {
        nonws += 1
        if (!inWord) { words += 1; inWord = true }
        if (cp == '.' || cp == '!' || cp == '?' || cp == ',' || cp == ';' || cp == ':') punct += 1
      }
    }
    mode match {
      case Words => words
      case NonWs => nonws
      case _     => punct
    }
  }

  /** Column-API entry point. */
  def column(c: Column, mode: Int): Column =
    GraftBridge.toColumn(new TextCount(GraftBridge.toExpression(c), mode))
}
