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

  test("q_dedup_minhash: no cartesian product anywhere") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
