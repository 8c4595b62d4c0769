package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Minimal bridge to `private[spark]` scheduler internals (same pattern
  * as `sql.graftshim.GraftColumn` for Column↔Expression): the listener
  * bus is asynchronous, and reading aggregated metrics right after an
  * action needs a drain barrier that Spark only exposes spark-privately. */
object GraftSparkInternals {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
