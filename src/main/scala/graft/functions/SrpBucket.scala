package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen-capable sign-random-projection LSH bucket of a float vector:
  * plane i's component for dimension d is ±1 from a DOUBLE-SQUARED
  * congruential PRNG (k = (i·64+d−1), P = 2^31−1):
  * `s = (1000003·k+12289) mod P; h = s² mod P;
  *  m = (h+k) mod P; m² mod P > 2^30−1`;
  * bucket bit i is set iff the projection Σ_d v[d]·sign(i,d)
  * (accumulated in DOUBLE in ascending d) is positive.
  *
  * BOTH mixing rounds are load-bearing, each fixing a measured
  * degeneracy:
  *  - The first square (round-1 bug): the raw linear term steps by
  *    1000003 per k and crosses the sign threshold only every ~1073
  *    consecutive indices, so all 64 dims of a plane would share one
  *    sign — every bucket degenerates to sign(Σv) and pruning
  *    vanishes.
  *  - The reinjection + second square (round-3 bug): after ONE square,
  *    values at lag 64 stay correlated (s² and (s+64·1000003)² share
  *    the dominant term), so plane i and plane i+1 produce correlated
  *    sign rows and bucket occupancy concentrates ~13× over uniform on
  *    a 50 k-vector corpus — adding k re-keys the value before the
  *    second square, restoring true-random-plane balance (measured
  *    1.6× uniform, equal to an RNG baseline; ScaleSmokeSpec gates
  *    it). Every intermediate stays < 2^62 — exact in BIGINT on both
  *    engines.
  *
  * Bit-for-bit the same arithmetic and fold order as the interpreted
  * `aggregate(sequence(...))` formulation and the DuckDB `list_reduce`
  * oracle fragment — only the evaluation engine changes (one fused
  * loop in whole-stage codegen instead of ~planes·dims interpreted
  * lambda steps per vector).
  *
  * `offset` shifts the plane indices (plane i → offset+i), giving
  * multi-table LSH its L independent hash tables from the same PRNG
  * stream: table t uses offset t·nPlanes. offset 0 is the original
  * single-table bucket (all existing oracles unchanged).
  *
  * `stride` is the per-plane PRNG index step (default 64 = the raw
  * embedding width; all existing call sites and oracles unchanged).
  * It must EXCEED the vector length: with stride 64 a 65-dim vector's
  * last dimension lands on index (i+1)·64 — exactly plane i+1's dim-1
  * coefficient — so adjacent planes share a sign component and lose
  * hash-table independence. The norm-augmented MIPS bucketing (65
  * dims) uses stride 128, putting the augmented dimension's index in a
  * range (…·128+64) no plane's leading dims can reach.
  */
case class SrpBucket(child: Expression, nPlanes: Int, offset: Int = 0,
    stride: Int = 64)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SrpBucket.bucket(input.asInstanceOf[ArrayData], nPlanes, offset, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SrpBucket.bucket($c, $nPlanes, $offset, $stride)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_srp_bucket"
}

object SrpBucket {
  final val P = 2147483647L

  def bucket(v: ArrayData, nPlanes: Int, offset: Int, stride: Int = 64): Long = {
    val n = v.numElements()
    var b = 0L
    var i = 0
    while (i < nPlanes) {
      var acc = 0.0
      var d = 1
      while (d <= n) {
        val k = (offset + i) * stride.toLong + d - 1
        val s = (1000003L * k + 12289L) % P
        val h = (s * s) % P
        val m = (h + k) % P
        val c = (m * m) % P
        acc += v.getFloat(d - 1).toDouble * (if (c > 1073741823L) 1.0 else -1.0)
        d += 1
      }
      if (acc > 0) b |= 1L << i
      i += 1
    }
    b
  }

  /** Column-API entry point. */
  def column(c: Column, nPlanes: Int, offset: Int = 0, stride: Int = 64): Column =
    GraftBridge.toColumn(
      new SrpBucket(GraftBridge.toExpression(c), nPlanes, offset, stride))
}
