package org.apache.spark

/** Bridge into `private[spark]` listener-bus draining so the bench can
  * read exact per-query shuffle byte counts: task-end events are
  * delivered asynchronously, and without a drain the bytes of a query's
  * last tasks would be charged to the NEXT query.
  */
object GraftMetricsBridge {
  def drainListeners(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
