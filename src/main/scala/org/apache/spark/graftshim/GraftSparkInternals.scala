package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Minimal bridge to `private[spark]` scheduler internals (same pattern
  * as `sql.graftshim.GraftColumn` for Column↔Expression): the listener
  * bus is asynchronous, and reading aggregated metrics right after an
  * action needs a drain barrier that Spark only exposes spark-privately. */
object GraftSparkInternals {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)

  /** Broadcast the session's Hadoop configuration for task-side
    * FileSystem access (`Configuration` itself is Writable, not
    * Serializable; Spark's own wrapper is spark-private, hence this
    * bridge). Tasks opening files directly — the WARC path-streaming
    * ingest — need the DRIVER's conf, not a fresh `new Configuration()`,
    * or session-configured filesystems (S3 credentials, custom schemes)
    * silently vanish on executors. */
  def broadcastHadoopConf(sc: SparkContext): GraftHadoopConf =
    new GraftHadoopConf(sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        sc.hadoopConfiguration)))

  /** Serializable handle on a broadcast Hadoop configuration — the only
    * public-to-graft surface of the spark-private wrapper. */
  final class GraftHadoopConf(
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.SerializableConfiguration])
      extends Serializable {
    def conf: org.apache.hadoop.conf.Configuration = bc.value.value
  }

  /** Run `body` on a fresh thread carrying the CALLER's Spark local
    * properties (job group, description, scheduler pool — all
    * thread-local in SparkContext). The mechanism behind running two
    * independent driver-side training loops concurrently without losing
    * job-group cancellation scoping (core/Batch.scala's contract).
    *
    * `getLocalProperties` returns the caller thread's LIVE Properties
    * (Spark clones only across parent→child InheritableThreadLocal), so
    * we snapshot it here — otherwise caller mutations race the worker —
    * and the thunk restores the executing thread's prior properties in a
    * finally, so a pooled thread never keeps the caller's job group. */
  def withInheritedLocalProperties[T](sc: SparkContext)(body: => T): () => T = {
    val snapshot = new java.util.Properties()
    snapshot.putAll(sc.getLocalProperties)
    () => {
      val prior = sc.getLocalProperties
      sc.setLocalProperties(snapshot)
      try body
      finally sc.setLocalProperties(prior)
    }
  }
}
