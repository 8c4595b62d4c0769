package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the rows-only sampling/sketch operators
  * (q_sample_stratified, q_approx_quantile) the DuckDB oracle cannot
  * replicate (RNG draws / sketch internals are engine-specific). */
class SamplingSpec extends SparkSpec {

  private lazy val strata = {
    import SparkSpec.spark.implicits._
    (1 to 3000).map { i =>
      val k = i % 3 match { case 0 => "O"; case 1 => "F"; case 2 => "P" }
      (i.toLong, k, (i * 37 % 1000).toDouble)
    }.toDF("id", "stratum", "v")
  }

  test("sampleBy hits each stratum's fraction within Bernoulli tolerance") {
    val fractions = Map("O" -> 0.1, "F" -> 0.5, "P" -> 1.0)
    val got = strata.stat.sampleBy("stratum", fractions, seed = 42L)
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each stratum has 1000 rows; 5 sigma of Bernoulli(p) over n=1000
    fractions.foreach { case (k, p) =>
      val n = got.getOrElse(k, 0L).toDouble
      val tol = 5 * math.sqrt(1000 * p * (1 - p)) max 1
      assert(math.abs(n - 1000 * p) <= tol,
        s"stratum $k: sampled $n of 1000 at p=$p")
    }
    assert(got("P") == 1000L) // p=1.0 keeps everything, exactly
  }

  test("sampleBy is deterministic for a fixed seed on the same data") {
    val fractions = Map("O" -> 0.1, "F" -> 0.5, "P" -> 1.0)
    def ids() = strata.stat.sampleBy("stratum", fractions, seed = 42L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids() == ids())
  }

  test("approx_percentile tracks the exact percentile on a known spread") {
    val out = strata
      .agg(expr("approx_percentile(v, array(0.25, 0.5, 0.75), 10000)").as("q"),
        expr("percentile(v, array(0.25, 0.5, 0.75))").as("exact"))
      .collect()(0)
    val approx = out.getSeq[Double](0)
    val exact = out.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      // accuracy 10000 over 3000 rows → sketch is effectively exact up
      // to interpolation (approx returns a data value, exact interpolates)
      assert(math.abs(a - e) <= 1.0, s"approx $a vs exact $e")
    }
  }
}
