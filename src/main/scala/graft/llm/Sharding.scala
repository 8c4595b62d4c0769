package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + sharding — the reproducible
  * training-order primitive (shard files a trainer streams in order).
  *
  * Reference anchor: the reference's batched input partitioning
  * (`repype/task.py` input handling) fixes WHICH rows run together but has
  * no notion of a reproducible global shuffle; this is the engine-side
  * primitive a training-data pipeline needs.
  */
object Sharding {

  /** Shard count for an `n`-doc corpus targeting `docsPerShard` rows per
    * shard, never below `minShards`: parallelism grows linearly with the
    * corpus instead of funneling it through a fixed number of window
    * tasks (a fixed count of 8 means 12.5 TB per task at 100 TB). */
  def shardCount(n: Long, docsPerShard: Long, minShards: Int = 8): Int = {
    require(docsPerShard > 0, s"docsPerShard must be positive, got $docsPerShard")
    require(minShards > 0, s"minShards must be positive, got $minShards")
    math.max(minShards.toLong, (n + docsPerShard - 1) / docsPerShard)
      .min(Int.MaxValue).toInt
  }

  /** Shuffle-shard assignment: shard = Knuth multiplicative hash of the id
    * (rerun- and cluster-size-stable, leakage-free — depends only on the
    * id), position within shard = md5-ordered row_number. Unlike
    * `ORDER BY rand()`: oracle-exact, identical on any engine, and
    * shuffle-light — no global sort, one window per shard partition.
    *
    * Per-shard window bound: with `shards = shardCount(n, docsPerShard)`
    * each row_number window task sees ~docsPerShard rows (multiplicative
    * hashing balances shards), a CONSTANT per-task bound as the corpus
    * grows. Callers must size `shards` from the corpus, not hardcode it —
    * a fixed count is a parallelism ceiling (the same caveat documented
    * on q_ccnet_buckets' exact-rank path).
    */
  def shuffleShard(docs: DataFrame, shards: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val u = (pmod(col(idCol), lit(2147483648L)) * lit(2654435761L)) %
      lit(4294967296L)
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), (u % lit(shards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w))
  }
}
