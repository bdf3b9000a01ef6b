package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen-capable dot product of two float-array columns, accumulated
  * in DOUBLE in index order — the exact IEEE operation sequence of the
  * interpreted `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)),
  * 0d, +)` formulation and of the DuckDB `list_reduce` oracle fragment,
  * so swapping it in changes nothing about results. This is the per-PAIR
  * hot path of every similarity operator (the candidate join evaluates
  * it O(candidates·k) times), where an interpreted higher-order lambda
  * with per-element boxing dominates the runtime.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatVecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_fvec_dot"
}

object FloatVecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def column(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      new FloatVecDot(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
