package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Minimal bridge to `private[spark]` scheduler internals (same pattern
  * as `sql.graftshim.GraftColumn` for Column↔Expression): the listener
  * bus is asynchronous, and reading aggregated metrics right after an
  * action needs a drain barrier that Spark only exposes spark-privately. */
object GraftSparkInternals {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)

  /** Run `body` on a fresh thread carrying the CALLER's Spark local
    * properties (job group, description, scheduler pool — all
    * thread-local in SparkContext). The mechanism behind running two
    * independent driver-side training loops concurrently without losing
    * job-group cancellation scoping (core/Batch.scala's contract). */
  def withInheritedLocalProperties[T](sc: SparkContext)(body: => T): () => T = {
    val props = sc.getLocalProperties // cloned snapshot (private[spark])
    () => { sc.setLocalProperties(props); body }
  }
}
