package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The measured-rebuild gauges' ground truth on the IVF side
  * ([[GraphAnnSpec]] pins the graph one): quantizer drift is exactly
  * 1e6 on an untouched index, invariant under duplicate-population
  * growth, and trips only when appended vectors genuinely sit farther
  * from the frozen centroids. */
class IndexHealthSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def emb(n: Int) =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < n)

  test("ivf drift: exactly 1e6 untouched, unchanged by twin growth, " +
      "tripped by a genuinely drifted append") {
    val idx = tempDir("ivfdrift-").toString + "/idx"
    Similarity.writeIvfIndex(emb(200), idx, nlist = 8)
    val fresh = Similarity.ivfIndexDrift(spark, idx).collect().head
    assert(fresh.getAs[Long]("drift_micro") === 1000000L)
    assert(!fresh.getAs[Boolean]("rebuild"))
    assert(fresh.getAs[Long]("build_n") === 200L)
    // duplicate-population growth: identical vectors double the integer
    // sum AND the count, so the mean — and the gauge — is bit-unchanged
    Similarity.appendToIvfIndex(
      emb(200).select((col("vec_id") + 100000).as("vec_id"),
        col("embedding")), idx)
    val twin = Similarity.ivfIndexDrift(spark, idx).collect().head
    assert(twin.getAs[Long]("drift_micro") === 1000000L)
    assert(!twin.getAs[Boolean]("rebuild"))
    assert(twin.getAs[Long]("n") === 400L)
    // a genuinely drifted append (+10 in every dim — far outside the
    // trained cells) must push the mean assignment distance over the
    // 25% default bar
    Similarity.appendToIvfIndex(
      emb(100).select((col("vec_id") + 200000).as("vec_id"),
        expr("transform(embedding, x -> x + cast(10 as float))")
          .as("embedding")), idx)
    val far = Similarity.ivfIndexDrift(spark, idx).collect().head
    assert(far.getAs[Long]("drift_micro") > 1250000L,
      far.getAs[Long]("drift_micro").toString)
    assert(far.getAs[Boolean]("rebuild"))
    // and the threshold is caller-tunable (isolating the rule)
    val loose = Similarity.ivfIndexDrift(spark, idx,
      maxDriftMicro = far.getAs[Long]("drift_micro") + 1).collect().head
    assert(!loose.getAs[Boolean]("rebuild"))
  }
}
