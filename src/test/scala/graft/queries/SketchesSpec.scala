package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the mergeable-sketch queries (DataSketches estimates
  * aren't DuckDB-reproducible, so these identities and error bounds are
  * the correctness gate instead of the SQL oracle). */
class SketchesSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")

  test("HLL: merging group sketches equals sketching the whole table") {
    val grouped = orders.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .head().getLong(0)
    // register-max union is lossless: merged and direct sketches are the
    // same sketch, so the estimates are identical, not just close
    assert(grouped == direct, s"merged=$grouped direct=$direct")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(grouped - exact).toDouble / exact < 0.05,
      s"HLL est $grouped vs exact $exact drifts > 5%")
  }

  test("theta set algebra matches the exact join answer in exact mode") {
    // sf0.001 cardinalities are far below theta's 4096-entry exact mode,
    // so union/intersection/difference estimates are exact integers
    val out = graft.SparkEntry.queries("q_sketch_theta_overlap")(spark, sfDir)
      .head()
    val y97 = orders.filter(year(col("o_orderdate")) === 1997)
      .select(col("o_custkey")).distinct()
    val y98 = orders.filter(year(col("o_orderdate")) === 1998)
      .select(col("o_custkey")).distinct()
    assert(out.getLong(0) == y97.count())
    assert(out.getLong(1) == y98.count())
    assert(out.getLong(2) == y97.union(y98).distinct().count())
    assert(out.getLong(3) == y97.intersect(y98).count())
    assert(out.getLong(4) == y97.exceptAll(y97.intersect(y98)).count())
  }

  test("CMS estimates never undercount and overshoot within eps·N") {
    val out = graft.SparkEntry.queries("q_sketch_cms_topk")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20)
    val docs = Tables.load(spark, sfDir, "documents")
    val totalGrams = docs
      .select(greatest(size(split(col("text"), " ")) - 1, lit(0)).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    for ((g, exact, est) <- out) {
      assert(est >= exact, s"CMS undercounted '$g': $est < $exact")
      assert(est - exact <= math.max(1L, (0.0001 * totalGrams).toLong * 10),
        s"CMS overshoot for '$g': est $est vs exact $exact (N=$totalGrams)")
    }
  }

  test("KLL merged quantiles sit within rank tolerance of the exact answer") {
    val out = graft.SparkEntry.queries("q_sketch_kll_quantiles")(spark, sfDir)
      .head()
    val (p50, p90, n) = (out.getDouble(0), out.getDouble(1), out.getLong(2))
    val fo = orders.filter(col("o_orderstatus").isin("F", "O"))
    assert(n == fo.count(), "merged sketch lost rows")
    // exact rank of the sketch's answer must be within KLL's ±1.7% rank
    // error (k=200 default, 99% confidence) — plus slack for small n
    val below50 = fo.filter(col("o_totalprice") <= p50).count().toDouble / n
    val below90 = fo.filter(col("o_totalprice") <= p90).count().toDouble / n
    assert(math.abs(below50 - 0.5) < 0.03, s"p50 rank off: $below50")
    assert(math.abs(below90 - 0.9) < 0.03, s"p90 rank off: $below90")
  }
}
