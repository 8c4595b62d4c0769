package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the mining tier: hashed TF-IDF (hand-computed md5
  * feature indexes/signs and smooth-idf fixed point), margin-based pair
  * mining (hubness correction pinned against raw cosine), and soft-dedup
  * reweighting. */
class MiningSpec extends SparkSpec {

  test("hashedTfidf: hand-computed md5 dims, signs, and smooth idf") {
    import SparkSpec.spark.implicits._
    // md5("a")=0cc175b9c... -> dim 0x0cc175b9 % 32 = 25, 9th nibble 'c' -> -1
    // md5("b")=92eb5ffee... -> dim 30, sign -1
    // md5("c")=4a8a08f09... -> dim 16, sign -1
    // N=2; idf_micro: df=1 -> round(ln(1.5),4dp)*1e4+1e4 = 14055; df=2 -> 10000
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = Featurize.hashedTfidf(docs, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (1L, 25L) -> -2L * 14055, // a: tf 2, sign -1
      (1L, 30L) -> -10000L, // b in doc 1
      (2L, 30L) -> -10000L, // b in doc 2
      (2L, 16L) -> -14055L)) // c
  }

  test("hashedTfidf: colliding terms sum (and exact cancellation drops " +
    "the component)") {
    import SparkSpec.spark.implicits._
    // dim=1 forces every term into component 0; signs still differ by
    // term, so same-sign terms accumulate and opposite signs cancel
    val docs = Seq((1L, "a b")).toDF("doc_id", "text") // both sign -1, df=1
    val got = Featurize.hashedTfidf(docs, dim = 1).collect()
    // N=1: idf_micro = round(ln(2/2),4)*1e4+1e4 = 10000 for both
    assert(got.length === 1)
    assert(got.head.getLong(2) === -20000L)
  }

  test("marginPairs: hubness correction — margin is cosine relative to " +
    "neighbourhood averages, exact integers") {
    import SparkSpec.spark.implicits._
    // src 1 = (1,0); tgt 10 = (1,0) twin, tgt 11 = (0.8,0.6) cos 0.8,
    // tgt 12 = (0,1) cos 0. k=2: fwd NN of src 1 = {10 (c 10000),
    // 11 (c 8000)}; sum_x = 18000. bwd NN of tgt 10 = {1} (only one src)
    // -> sum_y = 10000; margin(1,10) = 10000*4e6 div 28000 = 1428571
    val src = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (10L, Seq(1.0, 0.0)), (11L, Seq(0.8, 0.6)), (12L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.marginPairs(src, tgt, k = 2, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    // only the k=2 forward pairs appear; the twin wins
    assert(got.length === 2)
    assert(got.head === ((1L, 10L, 10000L, 10000L * 4000000 / 28000)))
    // pair (1,11): sum_y(11) = 8000 (one src); margin = 8000*4e6/26000
    assert(got(1) === ((1L, 11L, 8000L, 8000L * 4000000L / 26000L)))
  }

  test("marginPairs: negative-cosine candidates never mined") {
    import SparkSpec.spark.implicits._
    val src = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq((10L, Seq(-1.0, 0.0)), (11L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.marginPairs(src, tgt, k = 2, topN = 10).collect()
    // cos(1,10) = -1 drops on c_micro >= 0; cos(1,11) = 0 survives only
    // if the denominator is positive — here sum_x = 0 + (-10000) < 0, so
    // nothing is mined at all
    assert(got.isEmpty)
  }

  test("marginPairsAnn: exhaustive probing (nprobe = nlist) reproduces " +
    "the exact path pair for pair") {
    import SparkSpec.spark.implicits._
    // deterministic 8-d vectors; nprobe = nlist makes IVF candidate
    // generation exhaustive, so the ANN path must agree with the exact
    // crossJoin path on every mined pair, cosine, and margin
    def vec(i: Long): Seq[Double] =
      (0 until 8).map(d => math.sin(i * 2.39996 + d * 0.73) + 0.1)
    val src = (0L until 15L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val tgt = (100L until 115L).map(i => (i, vec(i * 7 + 3)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.marginPairs(src, tgt, k = 3, topN = 20)
      .collect().map(_.toSeq).toSeq
    val ann = Similarity.marginPairsAnn(src, tgt, k = 3, topN = 20,
        nlist = 4, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    assert(ann === exact)
  }

  test("marginPairsAnn: planted twins mine at cosine 1.0 above the " +
    "margin bar under real nprobe < nlist pruning") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val src = emb.filter(col("label") === 0).select("vec_id", "embedding")
    val planted = src.filter(col("vec_id") < 100)
    val tgt = emb.filter(col("label") === 1).select("vec_id", "embedding")
      .unionByName(planted.select(
        (col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    val mined = Similarity.marginPairsAnn(src, tgt, k = 4, topN = 60,
      nlist = 16, nprobe = 4).collect()
    val twins = mined.filter(r => r.getLong(1) == r.getLong(0) + 100000L)
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val nPlanted = planted.count()
    assert(twins.length.toLong === nPlanted)
    assert(twins.forall(_._2 == 10000L),
      s"twin cosines not 1.0: ${twins.mkString(",")}")
    assert(twins.forall(_._3 >= 1400000L),
      s"twin margins under bar: ${twins.mkString(",")}")
  }

  test("marginPairsIndexed ≡ marginPairsAnn on the same sides — the " +
    "persisted path cannot drift from the in-memory one") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val src = emb.filter(col("label") === 0).select("vec_id", "embedding")
    val tgt = emb.filter(col("label") === 1).select("vec_id", "embedding")
    val inMem = Similarity.marginPairsAnn(src, tgt, k = 4, topN = 30,
      nlist = 8, nprobe = 3).collect().map(_.toSeq).toSeq
    val si = tempDir("margin_si").toString
    val ti = tempDir("margin_ti").toString
    Similarity.writeIvfIndex(src, si, nlist = 8)
    Similarity.writeIvfIndex(tgt, ti, nlist = 8)
    val indexed = Similarity.marginPairsIndexed(spark, si, ti,
      k = 4, topN = 30, nprobe = 3).collect().map(_.toSeq).toSeq
    // deterministic seeded training → identical centroids → identical
    // candidates, cosines, and margins
    assert(indexed === inMem)
  }

  test("hashedTfidfDense: sparse components land at their md5 dims, " +
    "zeros elsewhere, under the embeddings column contract") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = Featurize.hashedTfidfDense(docs, dim = 32)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Seq[Double]]("embedding")).toMap
    assert(got(1L).length === 32)
    assert(got(1L)(25) === -2.0 * 14055) // a at dim 25
    assert(got(1L)(30) === -10000.0) // b at dim 30
    assert(got(1L).zipWithIndex.filter(p => p._2 != 25 && p._2 != 30)
      .forall(_._1 === 0.0))
    assert(got(2L)(16) === -14055.0 && got(2L)(30) === -10000.0)
  }

  test("composition: duplicate documents become sim_key-1e6 neighbours " +
    "in the NN-Descent doc graph") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles the aggregate by its grouping key"),
      (2L, "spark shuffles the aggregate by its grouping key"), // twin
      (3L, "parquet scans prune columns and push filters down"),
      (4L, "watermarks bound state in streaming session windows"),
      (5L, "broadcast joins keep the small dimension on every executor"))
      .toDF("doc_id", "text")
    val g = GraphAnn.nnDescentGraph(
        Featurize.hashedTfidfDense(docs, dim = 32), k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(g((1L, 1)) === ((2L, 1000000L)))
    assert(g((2L, 1)) === ((1L, 1000000L)))
  }

  test("softDedupWeights: 1/frequency weights and effective token mass") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "unique doc here now"))
      .toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (1L, 2L, 500000L, 3L * 500000),
      (2L, 2L, 500000L, 3L * 500000),
      (3L, 1L, 1000000L, 4L * 1000000)))
    // the reweighted corpus token mass counts each DISTINCT text once
    val eff = got.map(_._4).sum
    assert(eff === (3L + 4L) * 1000000)
  }

  test("marginPairs refuses corpus-scale sides and steers to the ANN path") {
    import SparkSpec.spark.implicits._
    // the exact anchor is all-pairs by design; a side past the fixture
    // ceiling must refuse BEFORE any crossJoin reaches the planner
    val big = spark.range(5001)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val small = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.marginPairs(big, small, k = 2, topN = 5)
    }
    assert(e.getMessage.contains("marginPairsAnn"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.marginPairs(small, big, k = 2, topN = 5)
    }
    assert(e2.getMessage.contains("5000"), e2.getMessage)
  }
}
