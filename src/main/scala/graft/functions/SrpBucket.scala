package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen-capable sign-random-projection LSH bucket of a float vector:
  * plane i's component for dimension d is ±1 from the SQUARED
  * congruential PRNG `s = (1000003·k+12289) mod P; s² mod P > 2^30−1`
  * (k = (i·64+d−1), P = 2^31−1), bucket bit i is set iff the projection
  * Σ_d v[d]·sign(i,d) (accumulated in DOUBLE in ascending d) is
  * positive. The SQUARE is load-bearing: the raw linear term steps by
  * 1000003 per k and crosses the sign threshold only every ~1073
  * consecutive indices, so all 64 dims of a plane (and ~16 adjacent
  * planes) would share one sign — every bucket degenerates to
  * sign(Σv), i.e. TWO populated buckets and no pruning at any scale
  * (the round-1 bug). Squaring mod P decorrelates the high bit
  * (measured: 2053 sign flips across 4096 consecutive k, 50.5% ones)
  * while keeping every intermediate < 2^62 — exact in BIGINT on both
  * engines. Bit-for-bit the same arithmetic and fold order as the
  * interpreted `aggregate(sequence(...))` formulation and the DuckDB
  * `list_reduce` oracle fragment — only the evaluation engine changes
  * (one fused loop in whole-stage codegen instead of ~planes·dims
  * interpreted lambda steps per vector).
  *
  * `offset` shifts the plane indices (plane i → offset+i), giving
  * multi-table LSH its L independent hash tables from the same PRNG
  * stream: table t uses offset t·nPlanes. offset 0 is the original
  * single-table bucket (all existing oracles unchanged).
  */
case class SrpBucket(child: Expression, nPlanes: Int, offset: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SrpBucket.bucket(input.asInstanceOf[ArrayData], nPlanes, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpBucket.bucket($c, $nPlanes, $offset)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_srp_bucket"
}

object SrpBucket {
  final val P = 2147483647L

  def bucket(v: ArrayData, nPlanes: Int, offset: Int): Long = {
    val n = v.numElements()
    var b = 0L
    var i = 0
    while (i < nPlanes) {
      var acc = 0.0
      var d = 1
      while (d <= n) {
        val s = (1000003L * ((offset + i) * 64 + d - 1) + 12289L) % P
        val c = (s * s) % P
        acc += v.getFloat(d - 1).toDouble * (if (c > 1073741823L) 1.0 else -1.0)
        d += 1
      }
      if (acc > 0) b |= 1L << i
      i += 1
    }
    b
  }

  /** Column-API entry point. */
  def column(c: Column, nPlanes: Int, offset: Int = 0): Column =
    GraftBridge.toColumn(new SrpBucket(GraftBridge.toExpression(c), nPlanes, offset))
}
