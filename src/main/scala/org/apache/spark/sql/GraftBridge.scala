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

  /** Re-tags a batch DataFrame as a STREAMING one (isStreaming=true)
    * — what a DSv1 `Source.getBatch` must return so the micro-batch
    * planner accepts it. This is exactly Spark's own FileStreamSource
    * device (`internalCreateDataFrame(df.queryExecution.toRdd, schema,
    * isStreaming = true)`), reachable only from this package.
    */
  def streamingDataFrame(df: Dataset[Row]): Dataset[Row] = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** Re-bases a DSv1 `Sink.addBatch` Dataset onto a plain batch plan.
    * The Dataset handed to addBatch is a view over the micro-batch's
    * already-planned IncrementalExecution; writing it through a new
    * action must not re-plan the streaming query, so the rows are
    * copied out of the incremental plan (InternalRow buffers are
    * reused — the copy is mandatory) and wrapped as a fresh batch
    * DataFrame. Same device as Spark's own memory/console sinks.
    */
  def rebasedBatchDataFrame(df: Dataset[Row]): Dataset[Row] = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rows = ds.queryExecution.toRdd.map(_.copy())
    ds.sparkSession.internalCreateDataFrame(rows, ds.schema, isStreaming = false)
  }
}
