package graft.queries

import graft.SparkSpec

/** Guards the physical-plan shapes the engine is designed around — a
  * regression here means a scan stopped pruning, a dimension stopped
  * broadcasting, or a top-k fell back to a global sort (all invisible to
  * result-correctness tests but fatal at 100 TB). */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q1_pricing: filter pushed to parquet, columns pruned") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // 7 of 11 lineitem columns read; shipment comment columns never scanned
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey")) // pruned: not referenced by Q1
  }

  test("q_join_multi: dimension joins broadcast") {
    val p = plan("q_join_multi")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_topn_global: TakeOrderedAndProject, no global sort+limit") {
    val p = plan("q_topn_global")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_topk_per_group: WindowGroupLimit prunes before the window") {
    assert(plan("q_topk_per_group").contains("WindowGroupLimit"))
  }

  test("q_sim_topk: query side broadcast, not corpus shuffle") {
    assert(plan("q_sim_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("q_heavy_hitters: candidate recount is a broadcast semi-join") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "expected the MG candidate set broadcast into a semi-join")
  }

  test("q_vocab_encode: encode join broadcasts the vocabulary") {
    assert(plan("q_vocab_encode").contains("BroadcastHashJoin"))
  }

  test("q_join_nullsafe: EqualNullSafe plans a hash join, no nested loop") {
    val p = plan("q_join_nullsafe")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_dedup_jaccard_prefix: prefix candidates, no cartesian anywhere") {
    val p = plan("q_dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_spans: gram equi-join + semi-join, no nested loop") {
    val p = plan("q_dedup_spans")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_join_range_binned: bin equi-join, no nested loop") {
    val p = plan("q_join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_latest_per_key: WindowGroupLimit prunes the rank-1 filter") {
    assert(plan("q_latest_per_key").contains("WindowGroupLimit"))
  }

  test("q_sim_ivf: cell equi-join candidates, no nested-loop anywhere") {
    val p = plan("q_sim_ivf")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin")) // probed query×cell list broadcast
  }

  test("q_decontaminate_bloom: sketch probe filters before the confirm join") {
    val p = plan("q_decontaminate_bloom")
    assert(p.contains("might_contain"), "bloom predicate missing from plan")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_decontaminate: benchmark side broadcast, no shuffle of train text") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_ngram_topk: top-k is TakeOrdered, not a global sort") {
    assert(plan("q_ngram_topk").contains("TakeOrderedAndProject"))
  }

  test("q_exists_subquery: EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan("q_exists_subquery")
    assert(p.contains("LeftSemi"))
    assert(p.contains("LeftAnti"))
  }

  test("join strategy hints are honored (merge / shuffle_hash / broadcast)") {
    import org.apache.spark.sql.functions.broadcast
    val c = graft.queries.Tables.load(spark, sfDir, "customer")
    val o = graft.queries.Tables.load(spark, sfDir, "orders")
    def planOf(df: org.apache.spark.sql.DataFrame) = {
      df.count() // materialize so AQE settles on the final physical plan
      df.queryExecution.executedPlan.toString
    }
    val cond = c("c_custkey") === o("o_custkey")
    assert(planOf(c.hint("merge").join(o, cond)).contains("SortMergeJoin"))
    assert(planOf(c.hint("shuffle_hash").join(o, cond)).contains("ShuffledHashJoin"))
    assert(planOf(broadcast(c).join(o, cond)).contains("BroadcastHashJoin"))
  }

  test("q_dedup_minhash: no cartesian product anywhere") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_embedding: LSH bucket equi-join, no nested-loop join") {
    val p = plan("q_dedup_embedding")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject")) // top-k, not global sort
  }

  test("q_dedup_embedding_planted: threshold near-dup has no nested-loop join") {
    val p = plan("q_dedup_embedding_planted")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_semantic: cluster equi-join candidates, no nested-loop join") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_quota_per_key: quota filter prunes via WindowGroupLimit") {
    assert(plan("q_quota_per_key").contains("WindowGroupLimit"))
  }

  test("q_tfidf: corpus-count side is broadcast, no shuffled cross join") {
    val p = plan("q_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin")) // the 1-row n_docs side
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sim_ann_lsh: candidate dedup shuffles bare ids, not vectors") {
    val df = graft.SparkEntry.queries("q_sim_ann_lsh")(spark, sfDir)
    // The HashAggregate implementing the candidate .distinct() must group
    // by exactly (query_id, cand_id) — a vector column in its keys means
    // 64-dim arrays went through the shuffle (the anti-pattern this plan
    // is designed around).
    // sparkPlan (pre-AQE): AdaptiveSparkPlanExec has no children, so
    // collect on executedPlan would see nothing.
    val agg = df.queryExecution.sparkPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    val distinctAggs = agg.filter(a =>
      a.groupingExpressions.nonEmpty && a.aggregateExpressions.isEmpty)
    assert(distinctAggs.nonEmpty)
    distinctAggs.foreach { a =>
      assert(!a.groupingExpressions.exists(e =>
        e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
        s"distinct carries array (vector) keys: ${a.groupingExpressions}")
    }
  }

  test("q_quality_gopher: one shuffle-free projection, no join/agg") {
    val p = plan("q_quality_gopher")
    // the battery must stay per-row: no joins, no aggregates, and the
    // ONLY exchange is the presentation sort's range partitioning
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(!p.contains("HashAggregate"), s"unexpected aggregate:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1, s"extra shuffle:\n$p")
  }

  test("q_shuffle_shard: no global sort before the per-shard window") {
    val p = plan("q_shuffle_shard")
    // ORDER BY rand()-style shuffles are the anti-pattern: the only wide
    // operations allowed are the shard hash partitioning + final order
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Window"), "per-shard position window missing")
  }

  test("q_embed_quantize: per-vector scale joins narrow, no nested loop") {
    val p = plan("q_embed_quantize")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_events_anomaly: single window pass, no self-join") {
    val p = plan("q_events_anomaly")
    assert(!p.contains("Join"), s"trailing-frame stats must not self-join:\n$p")
    assert(p.contains("Window"))
  }

  test("q_incremental_agg: partial-merge and direct agg, equi-join only") {
    val p = plan("q_incremental_agg")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_importance_dsir: log-ratio table broadcasts, tokens never sort") {
    val p = plan("q_importance_dsir")
    // the 256-row bucket table must come back as a broadcast hash join —
    // a shuffled (sort-merge) join here would repartition every exploded
    // token row by bucket, the exact full-corpus shuffle the design avoids
    assert(p.contains("BroadcastHashJoin"), s"bucket join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token-side shuffle join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
