package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hybrid retrieval (RRF fusion) semantics + plan shape. The end-to-end
  * value correctness is hash-gated by q_hybrid_rrf's DuckDB oracle; these
  * pin the fusion edge cases the oracle data may not exercise and the
  * distributed-top-K plan shape. */
class RetrievalSpec extends SparkSpec {

  private def lexList(rows: Seq[(Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lex_rank")
  }
  private def vecList(rows: Seq[(Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "vec_rank")
  }

  test("rrfFuse: both-list docs sum contributions; single-list docs keep " +
      "a NULL rank and the other list's exact integer contribution") {
    val out = Retrieval.rrfFuse(
        lexList(Seq(1L -> 1, 2L -> 2)), vecList(Seq(2L -> 1, 3L -> 2)),
        rrfK = 60, topK = 10)
      .orderBy(col("fused_rank"))
      .select("doc_id", "lex_rank", "vec_rank", "rrf_micro", "fused_rank")
      .collect()
    val rows = out.map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1 else r.getInt(1),
      if (r.isNullAt(2)) -1 else r.getInt(2),
      r.getLong(3), r.getInt(4)))
    // 1e6 div 61 = 16393, div 62 = 16129
    assert(rows.toSeq === Seq(
      (2L, 2, 1, 16129L + 16393L, 1),
      (1L, 1, -1, 16393L, 2),
      (3L, -1, 2, 16129L, 3)))
  }

  test("rrfFuse: equal fused scores break ties by doc_id, and topK " +
      "truncates after ranking") {
    val out = Retrieval.rrfFuse(
        lexList(Seq(5L -> 1)), vecList(Seq(3L -> 1, 9L -> 2)),
        rrfK = 60, topK = 2)
      .orderBy(col("fused_rank"))
      .select("doc_id", "fused_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // docs 3 and 5 both score 16393: lower id wins; doc 9 is cut by topK
    assert(out.toSeq === Seq((3L, 1), (5L, 2)))
  }

  test("both list builders plan a distributed top-K " +
      "(TakeOrderedAndProject), never a global sort of the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (df <- Seq(Retrieval.topLexical(docs, Seq("join", "scan"), 50),
        Retrieval.topVector(embs, 0L, 50))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        s"list builder lost the top-K plan:\n$p")
    }
    Caches.release()
    spark.catalog.clearCache()
  }

  test("hybridRrf end-to-end: contiguous fused ranks, non-increasing " +
      "scores, and every surfaced doc carries at least one rank") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = Retrieval.hybridRrf(docs, embs,
        Seq("join", "scan", "stream"), queryVecId = 0L,
        perList = 50, rrfK = 60, topK = 20)
      .orderBy(col("fused_rank")).collect()
    assert(out.length === 20)
    assert(out.map(_.getInt(out.head.fieldIndex("fused_rank"))).toSeq ===
      (1 to 20))
    val micros = out.map(_.getLong(out.head.fieldIndex("rrf_micro")))
    assert(micros.zip(micros.tail).forall { case (a, b) => a >= b })
    val li = out.head.fieldIndex("lex_rank")
    val vi = out.head.fieldIndex("vec_rank")
    assert(out.forall(r => !r.isNullAt(li) || !r.isNullAt(vi)))
    Caches.release()
    spark.catalog.clearCache()
  }

  test("topDirichletQL: a doc containing the term outranks an identical-" +
      "length doc without it, smoothing still scores the absent doc, " +
      "longer docs get no free ride, OOV terms drop") {
    import graft.SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "spark data spark engine test"), // tf(spark)=2, len 5
      (2L, "other words fill this line"), // tf=0, len 5
      (3L, "spark " + Seq.fill(40)("pad").mkString(" ")) // tf=1, len 41
    ).toDF("doc_id", "text")
    val out = Retrieval.topDirichletQL(docs, Seq("spark"), perList = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2)))).toMap
    // all three docs scored (smoothing: no -inf for doc 2)
    assert(out.size === 3)
    assert(out(1L)._2 === 1) // highest tf, short doc
    assert(out(2L)._1 < out(1L)._1)
    // μ=2000 ≫ these doc lengths, so the |d|+μ length penalty outweighs
    // doc 3's single extra tf against doc 2 — the Dirichlet long-doc
    // correction working exactly as published
    assert(out(3L)._1 < out(2L)._1)
    // an OOV query term (absent from the whole collection) drops: the
    // scores equal the single-term query's
    val withOov = Retrieval.topDirichletQL(docs,
        Seq("spark", "zzzmissing"), perList = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withOov === out.view.mapValues(_._1).toMap)
    Caches.release()
    spark.catalog.clearCache()
  }

  private def docs2(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("phraseMatches: counts overlapping occurrences, is order-" +
      "sensitive, and drops docs without the full phrase") {
    val d = docs2(Seq(
      1L -> "a b a b a",   // "a b" twice; "b a" twice
      2L -> "b a b",       // "a b" once
      3L -> "a a b b",     // "a b" once (middle)
      4L -> "b b a"))      // "a b" never
    val ab = Retrieval.phraseMatches(d, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    val aab = Retrieval.phraseMatches(d, Seq("a", "a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aab === Map(3L -> 1L))
    Caches.release()
    spark.catalog.clearCache()
  }

  test("phraseMatches: trailing-separator empty tokens never break " +
      "adjacency (positions number the raw split)") {
    val d = docs2(Seq(1L -> "x y ", 2L -> "x  y"))
    // doc 1: "x"@0 "y"@1 ""@2 -> adjacent; doc 2: "x"@0 ""@1 "y"@2 -> NOT
    val got = Retrieval.phraseMatches(d, Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L))
    Caches.release()
    spark.catalog.clearCache()
  }

  test("proximityMatches: band join is lossless at exactly maxDist " +
      "across a band boundary, and pairs beyond maxDist drop") {
    // maxDist=3 -> band width 4. doc 1: a@3, b@4 — adjacent bands,
    // dist 1. doc 2: a@0, b@3 — same band, dist exactly 3. doc 3:
    // a@0, b@4 — adjacent bands but dist 4 (must drop). doc 4: a@0,
    // b@0+8 — two bands apart (probe fanout must not reach it).
    val d = docs2(Seq(
      1L -> "x y z a b",
      2L -> "a y z b",
      3L -> "a y z w b",
      4L -> "a y z w v u w2 y2 b"))
    val got = Retrieval.proximityMatches(d, "a", "b", maxDist = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
    Caches.release()
    spark.catalog.clearCache()
  }

  test("rankingMetrics: a singleton label class (n_rel = 0) scores all " +
      "zeros instead of crashing on the idcg lookup") {
    val s = spark
    import s.implicits._
    // query 1's label is unique in the corpus -> n_rel = 0; Spark
    // evaluates the idcg element_at column even under the n_rel=0 CASE,
    // so an unclamped index 0 would throw INVALID_INDEX_OF_ZERO
    val labels = Seq((1L, 99), (2L, 5), (3L, 5)).toDF("vec_id", "label")
    val retrieved = Seq((1L, 1, 2L), (1L, 2, 3L))
      .toDF("query_id", "rk", "cand_id")
    val got = EvalMetrics.rankingMetrics(retrieved, labels, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("beamBigramDecode: width 1 follows the greedy path; width 2 " +
      "keeps the two best-scoring paths; dead-end beams die") {
    // from s: s->m (2), s->z (1). from m: m->a, m->b (1 each).
    // z and a and b are final-only.
    val d = docs2(Seq(
      1L -> "s m b",
      2L -> "s m a",
      3L -> "b s z"))
    val w1 = Retrieval.beamBigramDecode(d, steps = 1, width = 1)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // step 1 greedy: s -> m (ln(2/3) beats ln(1/3))
    assert(w1 === Seq(1 -> "s m"))
    val w2 = Retrieval.beamBigramDecode(d, steps = 1, width = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(w2 === Seq(1 -> "s m", 2 -> "s z"))
    // step 2: "s m" expands to "s m a"/"s m b" (tie, path asc);
    // "s z" dies (z is final-only)
    val w2s2 = Retrieval.beamBigramDecode(d, steps = 2, width = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(w2s2 === Seq(1 -> "s m a", 2 -> "s m b"))
    Caches.release()
    spark.catalog.clearCache()
  }

  test("greedyBigramChain: follows max-count continuations with the " +
      "lexicographic tie-break and stops early at a final-only token") {
    // starts: "s" (2 docs) beats "a" (1). bigrams from s: s->m twice,
    // s->z once => m. from m: tie m->b / m->a (1 each) => "a" wins lex.
    // "a" occurs only document-finally => chain stops at step 2.
    val d = docs2(Seq(
      1L -> "s m b",
      2L -> "s m a",
      3L -> "b s z"))
    val got = Retrieval.greedyBigramChain(d, steps = 8)
      .orderBy(col("step"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq(0 -> "s", 1 -> "m", 2 -> "a"))
    Caches.release()
    spark.catalog.clearCache()
  }
}
