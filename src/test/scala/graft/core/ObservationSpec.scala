package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** In-plan observation metrics (`Metrics.observed` → CollectMetrics):
  * aggregates ride the job that produces the result, so volume
  * invariants cost zero extra scans. */
class ObservationSpec extends SparkSpec {

  test("observed metrics equal a direct aggregate, within the same job") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 10)
    val (df, obs) = Metrics.observed(lineitem, "vol",
      count(lit(1)).as("rows"),
      sum(col("l_quantity")).as("qty"),
      sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("null_shipdates"))
    val out = df.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect()
    assert(out.nonEmpty)
    val m = obs.get
    val direct = lineitem
      .agg(count(lit(1)), sum(col("l_quantity"))).head()
    assert(m("rows") == direct.getLong(0))
    assert(m("qty") == direct.getDouble(1))
    assert(m("null_shipdates") == 0L)
  }

  test("top-placed observation does not block predicate pushdown") {
    // the regression this pins: a CollectMetrics node BETWEEN a filter
    // and its scan blocks pushdown (observe-then-filter plans with
    // PushedFilters: []); Task.store places observations at the top of
    // each stored field's final plan, where the filter still reaches
    // the parquet scan
    val filtered = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= "1998-09-02")
    val (df, _) = Metrics.observed(filtered, "pushdown_probe",
      count(lit(1)).as("rows"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filter not pushed below the observation:\n$plan")
  }

  test("observation at an intermediate point sees pre-aggregation rows") {
    // the observe sits BELOW the aggregate: it must report input rows to
    // the agg, not output groups — the "rows in vs rows out" invariant
    val events = Tables.load(spark, sfDir, "events")
    val (df, obs) = Metrics.observed(events, "pre_agg",
      count(lit(1)).as("rows_in"))
    val grouped = df.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect()
    val rowsOut = grouped.map(_.getLong(1)).sum
    assert(obs.get("rows_in") == rowsOut,
      "observed input rows must equal the sum over output groups")
    assert(grouped.length < rowsOut.toInt, "aggregation must have reduced")
  }
}
