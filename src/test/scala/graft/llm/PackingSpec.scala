package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the greedy sequence packer (not SQL-expressible, so
  * no DuckDB oracle): budget respected, nothing dropped or duplicated,
  * deterministic run-to-run. */
class PackingSpec extends SparkSpec {

  private def corpus = {
    import SparkSpec.spark.implicits._
    // doc i has (i % 37) + 1 whitespace tokens — varied but deterministic
    (0L until 200L).map { i =>
      (i, Seq.fill((i % 37).toInt + 1)("tok").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("every document packed exactly once, budget respected") {
    val out = Packing.packGreedy(corpus, tokenBudget = 50, numBuckets = 8)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 200L))
    // per-pack token totals: within budget unless the pack is a single
    // over-long document (packer never drops data)
    val perPack = out.groupBy("pack_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .collect()
    assert(perPack.forall(r => r.getLong(1) <= 50 || r.getLong(2) == 1))
    // pack_seq is contiguous 0..n-1 within each pack
    val seqs = out.groupBy("pack_id")
      .agg(collect_list("pack_seq").as("seqs")).collect()
    assert(seqs.forall { r =>
      val s = r.getSeq[Int](1).sorted
      s == (0 until s.length)
    })
  }

  test("packing is deterministic run-to-run") {
    val a = Packing.packGreedy(corpus, tokenBudget = 64, numBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    val b = Packing.packGreedy(corpus, tokenBudget = 64, numBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("greedy fill order follows ascending doc_id within a bucket") {
    import SparkSpec.spark.implicits._
    // one bucket, 4 docs of 30 tokens, budget 60 → packs {0,1} and {2,3}
    val docs = (0L until 4L).map(i => (i, Seq.fill(30)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.packGreedy(docs, tokenBudget = 60, numBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out(0L) == out(1L))
    assert(out(2L) == out(3L))
    assert(out(0L) != out(2L))
  }
}
