package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the deterministic shuffle-shard primitive, including the
  * scale contract the round-5 verdict flagged: shard count must grow with
  * the corpus so per-window-task rows stay bounded. */
class ShardingSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import SparkSpec.spark.implicits._
    (0 until n).map(_.toLong).toDF("doc_id")
  }

  test("shardCount grows linearly with the corpus and floors at minShards") {
    assert(Sharding.shardCount(500, 64) == 8)
    assert(Sharding.shardCount(5000, 64) == 79)
    assert(Sharding.shardCount(1, 64) == 8)
    assert(Sharding.shardCount(5000000, 64) == 78125)
    assert(Sharding.shardCount(100, 64, minShards = 2) == 2)
  }

  test("shuffleShard partitions the corpus: every doc once, pos dense per shard") {
    val n = 500
    val out = Sharding.shuffleShard(corpus(n), Sharding.shardCount(n, 64))
      .collect()
    assert(out.length == n)
    assert(out.map(_.getLong(0)).toSet.size == n)
    // pos is 1..count within each shard (dense, no gaps/dups)
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ps = rows.map(_.getInt(2)).sorted
      assert(ps.toSeq == (1 to rows.length))
    }
  }

  test("per-shard rows stay bounded at a 10x corpus (no parallelism ceiling)") {
    val docsPerShard = 64
    def maxShardRows(n: Int): Long =
      Sharding.shuffleShard(corpus(n), Sharding.shardCount(n, docsPerShard))
        .groupBy(col("shard")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
    val at1x = maxShardRows(500)
    val at10x = maxShardRows(5000)
    // the whole point of deriving the shard count: the per-window bound
    // must NOT grow ~10x with the corpus — it stays ~docsPerShard
    assert(at10x <= 2L * docsPerShard,
      s"per-shard rows grew past the bound: $at10x at 10x (1x was $at1x)")
  }

  test("shuffleShard is deterministic across reruns") {
    val df = corpus(300)
    def run() = Sharding.shuffleShard(df, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(run() == run())
  }
}
