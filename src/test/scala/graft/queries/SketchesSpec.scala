package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the mergeable-sketch queries: DataSketches estimates
  * aren't DuckDB-reproducible, so the queries verify their sketches'
  * contracts in-plan (booleans the oracle gates) and these specs pin the
  * identities and error bounds with an INDEPENDENT computation — the
  * sketch re-built directly here, never through the query under test. */
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
    // so union/intersection/difference estimates are exact integers.
    // The sketches are rebuilt HERE (independent of the query, whose own
    // gate booleans are additionally asserted all-true).
    def sk(y: Int) = orders.filter(year(col("o_orderdate")) === y)
      .agg(theta_sketch_agg(col("o_custkey")).as("sk"))
    val ests = sk(1997).crossJoin(sk(1998).withColumnRenamed("sk", "sk2"))
      .select(
        round(theta_sketch_estimate(col("sk"))).cast("long"),
        round(theta_sketch_estimate(col("sk2"))).cast("long"),
        round(theta_sketch_estimate(theta_union(col("sk"), col("sk2"))))
          .cast("long"),
        round(theta_sketch_estimate(theta_intersection(col("sk"), col("sk2"))))
          .cast("long"),
        round(theta_sketch_estimate(theta_difference(col("sk"), col("sk2"))))
          .cast("long"))
      .head()
    val y97 = orders.filter(year(col("o_orderdate")) === 1997)
      .select(col("o_custkey")).distinct()
    val y98 = orders.filter(year(col("o_orderdate")) === 1998)
      .select(col("o_custkey")).distinct()
    assert(ests.getLong(0) == y97.count())
    assert(ests.getLong(1) == y98.count())
    assert(ests.getLong(2) == y97.union(y98).distinct().count())
    assert(ests.getLong(3) == y97.intersect(y98).count())
    assert(ests.getLong(4) == y97.exceptAll(y97.intersect(y98)).count())
    val out = graft.SparkEntry.queries("q_sketch_theta_overlap")(spark, sfDir)
      .head()
    for (i <- 5 to 9) assert(out.getBoolean(i), s"gate column $i is false")
  }

  test("CMS estimates never undercount and overshoot within eps·N") {
    // independent re-probe: rebuild the sketch and the exact counts here
    val docs = Tables.load(spark, sfDir, "documents")
    val words = split(col("text"), " ")
    val grams = when(size(words) >= 2,
        transform(sequence(lit(1), size(words) - 1),
          i => concat_ws(" ", element_at(words, i), element_at(words, i + 1))))
      .otherwise(array())
    val stream = docs.select(explode(grams).as("g"))
    val bytes = stream
      .agg(expr("count_min_sketch(g, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
    val totalGrams = stream.count()
    val top = stream.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((g, exact) <- top) {
      val est = cms.estimateCount(
        g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est >= exact, s"CMS undercounted '$g': $est < $exact")
      assert(est - exact <= math.max(1L, (0.0001 * totalGrams).toLong * 10),
        s"CMS overshoot for '$g': est $est vs exact $exact (N=$totalGrams)")
    }
    // and the query's own gate booleans agree
    val out = graft.SparkEntry.queries("q_sketch_cms_topk")(spark, sfDir)
      .collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }

  test("KLL merged quantiles sit within rank tolerance of the exact answer") {
    // independent rebuild: merge the two status sketches directly and
    // rank-check the read-off quantiles against the exact data
    val fo = orders.filter(col("o_orderstatus").isin("F", "O"))
    def sk(st: String, as: String) =
      fo.filter(col("o_orderstatus") === st)
        .agg(kll_sketch_agg_double(col("o_totalprice")).as(as))
    val qs = sk("F", "sk_f").crossJoin(sk("O", "sk_o"))
      .select(kll_sketch_merge_double(col("sk_f"), col("sk_o")).as("m"))
      .select(
        kll_sketch_get_quantile_double(col("m"), lit(0.5)).as("p50"),
        kll_sketch_get_quantile_double(col("m"), lit(0.9)).as("p90"))
      .head()
    val (p50, p90) = (qs.getDouble(0), qs.getDouble(1))
    val n = fo.count()
    // exact rank of the sketch's answer must be within KLL's ±1.7% rank
    // error (k=200 default, 99% confidence) — plus slack for small n
    val below50 = fo.filter(col("o_totalprice") <= p50).count().toDouble / n
    val below90 = fo.filter(col("o_totalprice") <= p90).count().toDouble / n
    assert(math.abs(below50 - 0.5) < 0.03, s"p50 rank off: $below50")
    assert(math.abs(below90 - 0.9) < 0.03, s"p90 rank off: $below90")
    // and the query's own gate row agrees
    val out = graft.SparkEntry.queries("q_sketch_kll_quantiles")(spark, sfDir)
      .head()
    assert(out.getLong(0) == n, "merged sketch lost rows")
    assert(out.getBoolean(1) && out.getBoolean(2))
  }
}
