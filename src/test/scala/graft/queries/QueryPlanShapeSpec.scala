package graft.queries

import graft.SparkSpec

/** Physical-plan shape assertions for the round-8 operators — the
  * .explain-and-iterate discipline, pinned so a refactor can't silently
  * degrade a candidate-generation plan into the quadratic shape these
  * operators exist to avoid. Qualitative (join strategy present/absent),
  * not node-count — AQE re-planning makes counts unstable. */
class QueryPlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("round-8 candidate-generation queries never plan a cartesian or " +
      "nested-loop join") {
    for (q <- Seq("q_boilerplate", "q_dedup_suffix", "q_url_dedup",
        "q_join_interval", "q_cdc_apply", "q_text_html_strip")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested loop:\n$p")
      graft.llm.Caches.release()
      spark.catalog.clearCache()
    }
  }

  test("q_embed_covariance joins only via the deliberate 1-row broadcast") {
    val p = plan("q_embed_covariance")
    // the means fold is a 1-row broadcast cross — BNLJ by design; what
    // must NOT appear is a shuffled join of the d²-amplified pair table
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"pair table is being shuffled into a join:\n$p")
  }

  test("q_join_interval joins on the bin key, not a theta predicate") {
    val p = plan("q_join_interval")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to the quadratic path:\n$p")
  }
}
