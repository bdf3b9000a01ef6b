package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression converters so
  * graft's custom Catalyst expressions (e.g. `graft.functions
  * .PolyCharFold`) can be used through the public Column API. This is
  * the conventional packaging trick for third-party Catalyst extensions
  * that don't want to route every call through a registered SQL
  * function.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Imperative function registration on an already-built session (the
    * extensions route in `graft.functions.GraftExtensions` covers
    * sessions built with `.withExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
