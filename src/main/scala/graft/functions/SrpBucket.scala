package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen-capable sign-random-projection LSH bucket of a float vector:
  * plane i's component for dimension d is ±1 from the polynomial PRNG
  * `(1000003·(i·64+d−1)+12289) mod (2^31−1) > 2^30−1`, bucket bit i is
  * set iff the projection Σ_d v[d]·sign(i,d) (accumulated in DOUBLE in
  * ascending d) is positive. Bit-for-bit the same arithmetic and fold
  * order as the interpreted `aggregate(sequence(...))` formulation and
  * the DuckDB `list_reduce` oracle fragment — only the evaluation
  * engine changes (one fused loop in whole-stage codegen instead of
  * ~planes·dims interpreted lambda steps per vector).
  */
case class SrpBucket(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SrpBucket.bucket(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpBucket.bucket($c, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_srp_bucket"
}

object SrpBucket {
  final val P = 2147483647L

  def bucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var b = 0L
    var i = 0
    while (i < nPlanes) {
      var acc = 0.0
      var d = 1
      while (d <= n) {
        val c = (1000003L * (i * 64 + d - 1) + 12289L) % P
        acc += v.getFloat(d - 1).toDouble * (if (c > 1073741823L) 1.0 else -1.0)
        d += 1
      }
      if (acc > 0) b |= 1L << i
      i += 1
    }
    b
  }

  /** Column-API entry point. */
  def column(c: Column, nPlanes: Int): Column =
    GraftBridge.toColumn(new SrpBucket(GraftBridge.toExpression(c), nPlanes))
}
