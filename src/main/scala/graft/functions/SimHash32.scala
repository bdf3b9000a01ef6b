package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen-capable 32-bit SimHash of a token array: each token is
  * char-folded (PolyCharFold, mult 31 — the library's standard token
  * hash) then MIXED by squaring mod P, and bit i of the fingerprint is
  * set iff the sum of ±1 votes from each token's mixed bit i is
  * positive (2·count(bit set) > n_tokens, counting multiplicity).
  *
  * The square is load-bearing: a raw polynomial fold of a SHORT token
  * concentrates in a narrow value band (acc ≈ 31^len·chars), so high
  * fingerprint bits are biased the same way across the whole corpus
  * and the effective entropy collapses — measured on a 20k-doc
  * wide-vocabulary corpus, raw-hash voting produced 1.4M hamming≤1
  * pairs where uniform bits predict ~3 (ScaleSmokeSpec pins this).
  * Squaring mod 2^31−1 avalanches the bits while staying exact in
  * int64 on both engines.
  *
  * One fused per-row loop replacing round 1's explode + 32-column
  * bit-count aggregation (dedup_simhash's 10 s hot path): the entire
  * fingerprint now evaluates scan-side inside whole-stage codegen with
  * no shuffle at all. Arithmetic is identical to the interpreted
  * formulation in [[TextFns.simhash]] and the DuckDB oracle fragment
  * in [[TextFns.simhashSql]] over [[TextFns.tokenHashesSql]].
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash32.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash32"
}

object SimHash32 {

  final val P = 2147483647L

  def fingerprint(words: ArrayData): Long = {
    val n = words.numElements()
    val counts = new Array[Int](32)
    var voters = 0L // non-null tokens only; the SQL-registered form
    var i = 0       // accepts ARRAY<STRING> with NULL elements
    while (i < n) {
      if (!words.isNullAt(i)) {
        voters += 1
        val h0 = PolyCharFold.fold(words.getUTF8String(i), 31L)
        val h = (h0 * h0) % P
        var b = 0
        while (b < 32) {
          counts(b) += ((h >> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (2L * counts(b) > voters) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Column-API entry point. */
  def column(c: Column): Column =
    GraftBridge.toColumn(new SimHash32(GraftBridge.toExpression(c)))
}
