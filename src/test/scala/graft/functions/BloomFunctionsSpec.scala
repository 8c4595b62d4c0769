package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-contract tests for the distributed Bloom build + probe: no false
  * negatives ever; false positives bounded by the configured bits/item. */
class BloomFunctionsSpec extends SparkSpec {

  test("no false negatives; false positives stay near the configured rate") {
    import SparkSpec.spark.implicits._
    val members = (0L until 1000L).toDF("v")
    val bloom = BloomFunctions.buildBloom(members, col("v"),
      expectedItems = 1000L, numBits = 8 * 1000L) // ~8 bits/item ≈ 2% FPP
    val hits = members.filter(BloomFunctions.mightContain(bloom, col("v"))).count()
    assert(hits == 1000L, s"false negatives: ${1000L - hits}")
    val nonMembers = (100000L until 101000L).toDF("v")
    val fps = nonMembers.filter(BloomFunctions.mightContain(bloom, col("v"))).count()
    assert(fps <= 100L, s"false-positive rate ${fps / 10.0}% way over budget")
  }

  test("build is distributed-merge safe: repartitioned input, same sketch behavior") {
    import SparkSpec.spark.implicits._
    val members = (0L until 500L).toDF("v").repartition(13)
    val bloom = BloomFunctions.buildBloom(members, col("v"),
      expectedItems = 500L, numBits = 8 * 500L)
    // every member still present after partial sketches merged across 13 tasks
    val hits = (0L until 500L).toDF("v")
      .filter(BloomFunctions.mightContain(bloom, col("v"))).count()
    assert(hits == 500L)
  }

  test("empty build fails loudly instead of returning a null sketch") {
    import SparkSpec.spark.implicits._
    val empty = Seq.empty[Long].toDF("v")
    intercept[IllegalArgumentException] {
      BloomFunctions.buildBloom(empty, col("v"), 10L, 80L)
    }
  }
}
