package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge applied to a symbol array: every LEFTMOST-FIRST,
  * NON-OVERLAPPING adjacent occurrence of (a, b) collapses into the
  * single symbol "a b" — the greedy application rule of the BPE
  * trainer (Sennrich et al. 2016), as a codegen scan-side pass. The
  * only subtle case is a run of equal symbols under an (x, x) merge:
  * leftmost-first consumes positions run_start, run_start+2, … (even
  * offsets), which is exactly the parity formulation the DuckDB
  * oracle's positional islands compute — the two stay provably equal.
  * Symbols are whitespace-free at round 0 (whitespace tokenization),
  * so the space-joined merged symbol never collides with an input
  * token; merge DECISIONS always compare whole array elements, never
  * the joined display strings.
  */
case class BpeMergeApply(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    BpeMergeApply.merge(input.asInstanceOf[ArrayData],
      UTF8String.fromString(a), UTF8String.fromString(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", UTF8String.fromString(a))
    val bRef = ctx.addReferenceObj("bpeB", UTF8String.fromString(b))
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeMergeApply.merge($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_merge"
}

object BpeMergeApply {
  private val Space = UTF8String.fromString(" ")

  def merge(w: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = w.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = w.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(a)) {
        val nxt = w.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(b)) {
          out.add(UTF8String.concat(a, Space, b))
          i += 2
        } else { out.add(cur); i += 1 }
      } else { out.add(cur); i += 1 }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  /** Column-API entry point. */
  def column(c: Column, a: String, b: String): Column =
    GraftBridge.toColumn(new BpeMergeApply(GraftBridge.toExpression(c), a, b))
}
