package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline state-partition RE-SIZE for a stateful streaming query — the
  * operational answer to the trap StreamingSpec pins and BASELINE.md's
  * round-7 note documents: Structured Streaming freezes the stateful
  * shuffle-partition count into the checkpoint at first run, so a
  * stream sized for day-one traffic keeps day-one state parallelism
  * forever, no matter what `spark.sql.shuffle.partitions` says at
  * restart. Spark has no supported in-place rewrite of HDFS-backed
  * state files to a new HashPartitioning; the published migration is
  * REPROCESS INTO A NEW CHECKPOINT — which this helper automates and,
  * crucially, VERIFIES, using the State Data Source reader
  * (`format("statestore")`) to prove the rebuilt state matches the old
  * checkpoint's key-for-key before the operator cuts traffic over.
  *
  * Procedure (the stream must be STOPPED and its source quiesced — new
  * files arriving between the old checkpoint's last commit and the
  * reprocess would legitimately change the rebuilt state and fail the
  * verification):
  *
  *  1. caller stops the stream;
  *  2. [[resize]] re-runs the SAME query definition over the source
  *     with `Trigger.AvailableNow` into a FRESH checkpoint under
  *     `spark.sql.shuffle.partitions = newPartitions` (the only moment
  *     the count is writable — first run);
  *  3. both checkpoints' state is read back through the statestore
  *     source and compared as (key, value) sets;
  *  4. the caller restarts the stream against the new checkpoint;
  *     subsequent input continues from the reprocessed offsets at the
  *     new parallelism with identical results (spec-pinned).
  *
  * The (key, value) equality check is exact for deterministic
  * aggregation state (counts/sums — state independent of micro-batch
  * boundaries). State that embeds event-time watermark bookkeeping can
  * differ benignly if the reprocess batches differently; the report
  * surfaces the diff counts and the caller judges.
  *
  * Sidecar reads (partition-dir counts) go through
  * [[graft.core.SidecarFs]] — checkpoints live on HDFS/object stores in
  * the deployments that need this tool most.
  */
object StateResize {

  /** Outcome of a [[resize]]: partition counts before/after, the rebuilt
    * state's key count, and the verification verdict (`matched` plus the
    * two one-sided diff counts behind it). */
  final case class Report(oldPartitions: Int, newPartitions: Int,
                          stateKeys: Long, onlyInOld: Long,
                          onlyInNew: Long) {
    def matched: Boolean = onlyInOld == 0 && onlyInNew == 0
  }

  /** The state-partition count frozen into a checkpoint (counted from
    * the state dir layout `state/<operatorId>/<partitionId>`). */
  def statePartitionCount(checkpoint: String, operatorId: Int = 0): Int =
    graft.core.SidecarFs.listNames(s"$checkpoint/state/$operatorId")
      .count(n => n.nonEmpty && n.forall(_.isDigit))

  /** The last committed batch's state rows of `checkpoint`, via the
    * State Data Source reader: (key struct, value struct, ...). */
  def stateRows(spark: SparkSession, checkpoint: String,
                operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
      .load(checkpoint)

  /** Reprocess into `newCheckpoint` at `newPartitions` and verify (see
    * object doc for the full contract). `rerun` must run the SAME query
    * over the SAME source with `Trigger.AvailableNow` into the
    * checkpoint it is given, blocking until termination — exactly the
    * launcher the production job already has, pointed at a new
    * checkpoint dir. */
  def resize(spark: SparkSession, oldCheckpoint: String,
             newCheckpoint: String, newPartitions: Int,
             rerun: (SparkSession, String) => Unit,
             operatorId: Int = 0): Report = {
    require(newPartitions > 0, s"newPartitions must be positive, got $newPartitions")
    require(!graft.core.SidecarFs.exists(s"$newCheckpoint/state"),
      s"$newCheckpoint already holds state — the partition count is only " +
        "writable at a checkpoint's FIRST run; pick a fresh dir")
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, newPartitions.toString)
    try rerun(spark, newCheckpoint)
    finally spark.conf.set(key, saved)
    val oldS = stateRows(spark, oldCheckpoint, operatorId)
      .select("key", "value")
    val newS = stateRows(spark, newCheckpoint, operatorId)
      .select("key", "value")
    Report(
      statePartitionCount(oldCheckpoint, operatorId),
      statePartitionCount(newCheckpoint, operatorId),
      newS.count(),
      oldS.exceptAll(newS).count(),
      newS.exceptAll(oldS).count())
  }
}
