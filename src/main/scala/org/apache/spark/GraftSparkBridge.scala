package org.apache.spark

/** Minimal bridge into `private[spark]` core internals — the sibling of
  * `org.apache.spark.sql.GraftBridge` for the one non-SQL need: the
  * bench's per-query TaskMetrics read must DRAIN the async listener bus
  * before sampling its accumulators, or a fast query could report the
  * metrics of its own last-straggler tasks into the next query's row.
  * Nothing else from the private surface is touched.
  */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
