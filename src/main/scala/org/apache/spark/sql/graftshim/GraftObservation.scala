package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Observation

/** Bridge to `private[sql]` Observation internals (same pattern as
  * [[GraftColumn]]): a NON-BLOCKING read of an observation's metrics.
  * `Observation.get` blocks until the observed plan executes — fatal for
  * the metrics drain, where stage outputs a sink never consumed simply
  * never run. `getOrEmpty` returns what is there (empty map if nothing
  * executed) without waiting. */
object GraftObservation {
  def resultsOrEmpty(obs: Observation): Map[String, Any] =
    obs.getOrEmpty
}
