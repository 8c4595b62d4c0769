package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the Misra–Gries frequent-items Aggregator: the
  * no-false-negative guarantee must hold across partial merges (the
  * whole point of the mergeable form), the counter bound must hold, and
  * the two-pass sketch-then-recount pipeline must equal the exact
  * brute-force answer.
  */
class MisraGriesSpec extends SparkSpec {

  private def stream = {
    import SparkSpec.spark.implicits._
    // 3000 hot (30%), 300 warm (3%), 6700 spread over 670 rare items;
    // 20 partitions force real partial merges
    val xs = Seq.fill(3000)("hot") ++ Seq.fill(300)("warm") ++
      (0 until 6700).map(i => s"rare_${i % 670}")
    xs.toDF("term").repartition(20)
  }

  test("every item above n/k survives the sketch across merges (k=20)") {
    val sketch = stream
      .agg(udaf(new Udafs.MisraGries(20)).apply(col("term")).as("m"))
      .head.getMap[String, Long](0)
    // n/k = 10000/20 = 500: "hot" (3000) must survive; bound <= k-1
    assert(sketch.contains("hot"))
    assert(sketch.size <= 19)
    // MG counts are underestimates, never overestimates
    assert(sketch("hot") <= 3000)
  }

  test("sketch candidates + exact recount == brute-force heavy hitters") {
    val k = 50 // threshold n/k = 200: hot and warm qualify, rare (10) don't
    val cands = stream
      .agg(Udafs.frequentCandidates(col("term"), k).as("ks"))
      .select(explode(col("ks")).as("term"))
    val total = stream.agg(count(lit(1)).as("n"))
    val twoPass = stream.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") * k > col("n"))
      .select(col("term"), col("c"))
    val exact = stream.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") * k > col("n"))
      .select(col("term"), col("c"))
    assert(twoPass.exceptAll(exact).isEmpty && exact.exceptAll(twoPass).isEmpty)
    assert(exact.count() == 2) // hot + warm — the test is not vacuous
  }
}
