package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen-capable MinHash signature of a shingle-hash array: k
  * permutation hashes h_i(x) = ((1000003·i+12289)·x + (999983·i+15373))
  * mod (2^31−1), signature[i] = min over the array. Same arithmetic as
  * the interpreted `transform(sequence(0,k−1), i -> array_min(...))`
  * formulation and the DuckDB oracle fragment in
  * [[TextFns.minhashSigSql]] — one fused loop instead of k interpreted
  * passes with per-element boxing.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  final val P = 2147483647L

  def sig(h: ArrayData, k: Int): ArrayData = {
    val n = h.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 1000003L * i + 12289L
      val b = 999983L * i + 15373L
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * h.getLong(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def column(c: Column, k: Int): Column =
    GraftBridge.toColumn(new MinHashSig(GraftBridge.toExpression(c), k))
}
