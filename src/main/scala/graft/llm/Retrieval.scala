package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval: the fusion step every production
  * retrieval stack runs on top of the two ranking families this library
  * already provides ([[TextAnalysis.bm25]] for the lexical list,
  * [[Similarity]] cosine for the vector list). Reciprocal-rank fusion
  * (RRF) combines the two rankings using only the RANKS — no score
  * normalization across incomparable scales — which is what makes it the
  * default fusion in practice.
  *
  * Scale shape: each list is produced as a distributed top-K
  * (`orderBy(...).limit(K)` plans as `TakeOrderedAndProject` — per-partition
  * heaps merged on the driver, never a global sort of the corpus), and
  * every window in this file runs AFTER that K-row truncation, so the
  * single-partition window frame is bounded by the constant `perList`,
  * not by corpus size. The fusion join touches at most `2 * perList`
  * rows regardless of data volume.
  *
  * Exactness: ranks are integers; the fused score is computed in integer
  * micro-units (`1_000_000 div (rrfK + rank)`), so the output carries no
  * float accumulation and hash-compares exactly against the DuckDB
  * oracle. Reference anchor for the capability: the reference pipeline
  * composes per-stage retrieval the same way its examples compose
  * stages (repype `tests/test_repype.py` stage chaining); the fusion
  * operator itself is the standard published RRF (Cormack et al.,
  * `1/(k + rank)` with k≈60).
  */
object Retrieval {

  /** Top-`perList` documents by summed BM25 over `queryTerms`, ranked.
    * The per-(doc, term) BM25 values are 4-decimal doubles (see
    * [[TextAnalysis.bm25]]'s float discipline); summing doubles would
    * reintroduce order-dependent drift, so each term score is first
    * fixed to integer micro-units and the per-doc total is an exact
    * integer sum. Returns (doc_id, lex_micro, lex_rank). */
  def topLexical(documents: DataFrame, queryTerms: Seq[String],
                 perList: Int): DataFrame = {
    val perDoc = TextAnalysis.bm25(documents, queryTerms)
      .groupBy(col("doc_id"))
      .agg(sum(round(col("bm25") * 10000).cast("long")).as("lex_micro"))
    // TakeOrderedAndProject: distributed top-K, then rank the K survivors
    // (window frame bounded by perList, not corpus size)
    val top = perDoc.orderBy(col("lex_micro").desc, col("doc_id")).limit(perList)
    top.withColumn("lex_rank", row_number()
      .over(Window.orderBy(col("lex_micro").desc, col("doc_id"))))
  }

  /** Top-`perList` corpus vectors by cosine to the single query vector
    * `queryVecId` (self excluded), ranked. The query row is a 1-row
    * broadcast; norms are hoisted before the join so each side's norm is
    * computed once per row ([[Similarity.bruteForceTopK]]'s discipline —
    * this is its single-query specialization with a distributed top-K
    * instead of a per-query window over the whole corpus). For the ANN
    * scale path, swap this list for an IVF/IVF-PQ probe
    * ([[Similarity]]); the fusion below is list-source-agnostic.
    * Returns (doc_id, vec_rank). */
  def topVector(embeddings: DataFrame, queryVecId: Long, perList: Int,
                vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryVecId)
      .select(col(vecCol).as("q_vec"))
      .withColumn("q_norm", Similarity.l2norm(col("q_vec")))
    val c = embeddings.filter(col(idCol) =!= queryVecId)
      .select(col(idCol).as("doc_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", Similarity.l2norm(col("c_vec")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos_raw", Similarity.dot(col("q_vec"), col("c_vec"))
        / (col("q_norm") * col("c_norm")))
    val top = scored.orderBy(col("cos_raw").desc, col("doc_id")).limit(perList)
    top.withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("cos_raw").desc, col("doc_id"))))
      .select(col("doc_id"), col("vec_rank"))
  }

  /** Reciprocal-rank fusion of two ranked lists. Inputs need (doc_id,
    * lex_rank) and (doc_id, vec_rank); a document missing from one list
    * contributes 0 from that list (its rank stays NULL in the output —
    * callers can see WHY a document surfaced). Fused score is the exact
    * integer `Σ 1_000_000 div (rrfK + rank)`; ties break by doc_id.
    * Returns the top `topK` as (doc_id, lex_rank, vec_rank, rrf_micro,
    * fused_rank). */
  def rrfFuse(lexical: DataFrame, vector: DataFrame,
              rrfK: Int = 60, topK: Int = 20): DataFrame = {
    val fused = lexical.select(col("doc_id"), col("lex_rank"))
      .join(vector.select(col("doc_id"), col("vec_rank")),
        Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"CAST(1000000 div ($rrfK + lex_rank) AS BIGINT)"), lit(0L))
          + coalesce(expr(s"CAST(1000000 div ($rrfK + vec_rank) AS BIGINT)"), lit(0L)))
    // the fusion frame holds at most |lexical| + |vector| rows (2·perList)
    fused.withColumn("fused_rank", row_number()
        .over(Window.orderBy(col("rrf_micro").desc, col("doc_id"))))
      .filter(col("fused_rank") <= topK)
  }

  /** Top-`perList` documents by Dirichlet-smoothed QUERY LIKELIHOOD —
    * the other published lexical ranking family next to BM25 (the
    * language-modeling approach: Ponte & Croft 1998; Dirichlet prior
    * smoothing per Zhai & Lafferty 2001, μ = 2000 their recommended
    * default):
    *
    *   score(q, d) = Σ_{t∈q} ln( (tf(t,d) + μ·cf(t)/|C|) / (|d| + μ) )
    *
    * Smoothing is the point: a document missing a query term still
    * scores the term's collection probability instead of −∞, so long
    * documents are not unfairly favored and every document is
    * comparable. Query terms ABSENT from the whole collection have no
    * collection probability and are dropped (the standard OOV rule).
    *
    * Exactness (the Kneser-Ney discipline): all counts are exact
    * integers; the per-(doc, term) probability is evaluated in the
    * stated association order — (tf + (μ·(cf/|C|))) / (|d| + μ) — then
    * ln → 4 dp → integer micro-units; doc scores are exact BIGINT sums
    * and the oracle replays the identical expression.
    *
    * Scale shape: one token scan feeds doc lengths, collection totals,
    * and the |q|-bounded cf/tf tables; the (doc × query-term) grid is a
    * broadcast cross of the |q|-row term table against doc lengths; the
    * final list is a distributed top-K (TakeOrderedAndProject), window
    * frame bounded by perList. Returns (doc_id, ql_micro, ql_rank). */
  def topDirichletQL(documents: DataFrame, queryTerms: Seq[String],
                     perList: Int, mu: Int = 2000,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = Caches.track(documents.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("t")))
    val docLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dlen"))
    val ctot = toks.agg(count(lit(1)).as("ctot"))
    val qt = queryTerms.distinct
    val qtoks = toks.filter(col("t").isin(qt: _*))
    val cf = qtoks.groupBy(col("t")).agg(count(lit(1)).as("cf"))
    val tf = qtoks.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val grid = docLen
      .crossJoin(broadcast(cf.crossJoin(ctot))) // |q| rows × 1 total
      .join(tf, Seq("doc_id", "t"), "left")
      .select(col("doc_id"), col("dlen"), col("t"), col("cf"),
        col("ctot"), coalesce(col("tf"), lit(0L)).as("tf"))
    val p = (col("tf").cast("double")
      + (lit(mu.toDouble)
        * (col("cf").cast("double") / col("ctot").cast("double")))) /
      (col("dlen").cast("double") + lit(mu.toDouble))
    val perDoc = grid
      .select(col("doc_id"),
        round(round(log(p), 4) * 10000).cast("long").as("micro"))
      .groupBy(col("doc_id"))
      .agg(sum(col("micro")).as("ql_micro"))
    val top = perDoc.orderBy(col("ql_micro").desc, col("doc_id"))
      .limit(perList)
    top.withColumn("ql_rank", row_number()
      .over(Window.orderBy(col("ql_micro").desc, col("doc_id"))))
  }

  /** End-to-end hybrid search: BM25 list + cosine list → RRF top-k over
    * the aligned (doc_id = vec_id) corpus. */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String], queryVecId: Long,
                perList: Int = 50, rrfK: Int = 60, topK: Int = 20): DataFrame =
    rrfFuse(topLexical(documents, queryTerms, perList),
      topVector(embeddings, queryVecId, perList),
      rrfK, topK)

  /** One (doc_id, term, pos) row per token — the flat token stream every
    * positional operator here builds on. Positions are 0-based ORIGINAL
    * token indices (empty tokens from doubled/trailing separators are
    * dropped AFTER numbering, so the surviving indices still reflect the
    * raw split — adjacency stays well-defined and both engines replay the
    * same numbering). */
  private[llm] def tokenStream(documents: DataFrame, textCol: String,
                               idCol: String): DataFrame =
    documents
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** Positional inverted index: one posting row per (term, doc_id) with
    * the sorted 0-based occurrence positions and the term frequency —
    * the on-disk layout behind phrase/proximity search in every lexical
    * engine (Lucene's positions file, re-expressed relationally).
    *
    * Scale shape: one tokenize scan + one hash aggregation keyed on
    * (term, doc_id) — linear shuffle in token volume, no windows, no
    * sorts over the corpus (the per-posting `sort_array` sorts each
    * BOUNDED position list in place). The result is naturally
    * term-partitionable for bucketed persistence. */
  def positionalPostings(documents: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame =
    tokenStream(documents, textCol, idCol)
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))

  /** Exact phrase match counts: documents containing the consecutive
    * token sequence `phrase`, with the number of occurrences. The token
    * stream is filtered to the phrase's terms BEFORE any join (postings
    * pruning — each join side is bounded by that term's corpus
    * frequency, never the token volume), then adjacent positions chain
    * via equi-joins on (doc_id, pos + i). */
  def phraseMatches(documents: DataFrame, phrase: Seq[String],
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = Caches.track(
      tokenStream(documents, textCol, idCol)
        .filter(col("term").isin(phrase: _*)))
    val first = toks.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val chained = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        val next = toks.filter(col("term") === w)
          .select(col("doc_id").as("n_doc"), col("pos").as("n_pos"))
        acc.join(next, col("n_doc") === col("doc_id") &&
            col("n_pos") === col("pos") + lit(i))
          .select(col("doc_id"), col("pos"))
    }
    chained.groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
  }

  /** Unordered proximity match counts: per document, the number of
    * (posA, posB) occurrence pairs of `termA` and `termB` within
    * `maxDist` token positions. Like [[phraseMatches]], both sides are
    * pruned to the query terms FIRST; the |posA − posB| ≤ maxDist
    * predicate then resolves through a LOSSLESS band join — positions
    * bucket into width-(maxDist+1) bands, candidates equi-join on
    * (doc_id, band ± 1), and the exact distance filter runs on that
    * constant-fanout candidate set. No inequality join ever reaches the
    * planner (an |a−b| ≤ k theta-join would plan as BNLJ), so the plan
    * stays shuffle-linear in the two terms' posting sizes. */
  def proximityMatches(documents: DataFrame, termA: String, termB: String,
                       maxDist: Int, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(termA != termB, "proximity terms must differ")
    val width = maxDist + 1
    val toks = Caches.track(
      tokenStream(documents, textCol, idCol)
        .filter(col("term").isin(termA, termB))
        .withColumn("band", (col("pos") / lit(width)).cast("long")))
    val a = toks.filter(col("term") === termA)
      .select(col("doc_id"), col("pos").as("pos_a"), col("band"))
      .select(col("doc_id"), col("pos_a"),
        explode(array(col("band") - 1, col("band"), col("band") + 1))
          .as("probe"))
    val b = toks.filter(col("term") === termB)
      .select(col("doc_id").as("b_doc"), col("pos").as("pos_b"),
        col("band").as("b_probe"))
    a.join(b, col("b_doc") === col("doc_id") &&
        col("probe") === col("b_probe"))
      .filter(abs(col("pos_a") - col("pos_b")) <= lit(maxDist))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_pairs"))
  }

  /** Greedy bigram-LM generation: from the corpus' most frequent
    * document-initial token, repeatedly follow the highest-count bigram
    * continuation (ties → lexicographically smallest next token) for up
    * to `steps` steps — the argmax decode of the corpus bigram model
    * (the deterministic skeleton of n-gram sampling; temperature-0
    * decoding in LM terms). The chain stops early iff the current token
    * never occurs with a successor (document-final only).
    *
    * Scale shape: bigram counts and the per-prev argmax are one
    * tokenize + two hash aggregations + one bounded window partitioned
    * by prev token (vocabulary-bounded state, like the tokenizer
    * learners); the generation itself is `steps` joins against that
    * cached vocabulary-sized argmax table — the chain is inherently
    * sequential, but each step touches one row, and NOTHING is collected
    * to the driver. Returns (step, word) for step 0..≤steps-1. */
  def greedyBigramChain(documents: DataFrame, steps: Int,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val toks = Caches.track(tokenStream(documents, textCol, idCol))
    val bigrams = toks.as("a")
      .join(toks.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.term").as("prev"), col("b.term").as("next"))
      .agg(count(lit(1)).as("cnt"))
    val wArg = Window.partitionBy(col("prev"))
      .orderBy(col("cnt").desc, col("next"))
    val argmax = Caches.track(bigrams
      .withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("prev"), col("next")))
    val start = toks.filter(col("pos") === 0)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(1)
      .select(lit(0).as("step"), col("term").as("word"))
    val states = Iterator.iterate(start.select(col("step"), col("word"))) {
      prev =>
        prev.as("g")
          .join(argmax.as("m"), col("m.prev") === col("g.word"))
          .select((col("g.step") + 1).as("step"), col("m.next").as("word"))
    }.take(steps).toSeq
    states.reduce(_ unionByName _)
  }

  /** Beam-search decode of the corpus bigram model — the width-`width`
    * generalization of [[greedyBigramChain]] (width 1 ≡ greedy): from
    * the most frequent document-initial token, expand every live beam
    * with all its bigram continuations, keep the `width` best by
    * cumulative log-probability, repeat `steps` times. Returns the
    * surviving beams as (rank, path, score_micro).
    *
    * Log-probabilities follow the [[topDirichletQL]] float discipline:
    * each ln(cnt/total) fixes to a 4-dp integer (×10⁴) BEFORE any
    * addition, so cumulative scores are exact integer sums and the
    * (score DESC, path ASC) beam cut is engine-reproducible. A beam
    * whose last token is document-final-only dies (no expansion).
    *
    * Scale shape: the lp model is the vocabulary-bounded bigram table
    * (built exactly like the greedy argmax — text never shuffles after
    * the one tokenize pass); each step joins ≤ width beam rows against
    * the cached model and ranks ≤ width·branching candidates — the
    * per-step window is model-bounded, never corpus-bounded. */
  def beamBigramDecode(documents: DataFrame, steps: Int, width: Int,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(steps >= 1 && width >= 1, "steps and width must be >= 1")
    val toks = Caches.track(tokenStream(documents, textCol, idCol))
    val bigrams = toks.as("a")
      .join(toks.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.term").as("prev"), col("b.term").as("next"))
      .agg(count(lit(1)).as("cnt"))
    val tots = bigrams.groupBy(col("prev")).agg(sum(col("cnt")).as("tot"))
    val lp = Caches.track(bigrams.join(tots, "prev")
      .select(col("prev"), col("next"),
        round(round(log(col("cnt").cast("double") / col("tot")), 4)
          * 10000).cast("long").as("lp")))
    val start = toks.filter(col("pos") === 0)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(1)
      .select(col("term").as("path"), col("term").as("last"),
        lit(0L).as("score"))
    val wCut = Window.orderBy(col("score").desc, col("path"))
    val fin = Iterator.iterate(start) { beams =>
      beams.as("g")
        .join(lp.as("m"), col("m.prev") === col("g.last"))
        .select(concat(col("g.path"), lit(" "), col("m.next")).as("path"),
          col("m.next").as("last"), (col("g.score") + col("m.lp")).as("score"))
        .withColumn("rn", row_number().over(wCut))
        .filter(col("rn") <= width)
        .select(col("path"), col("last"), col("score"))
    }.drop(steps).next()
    fin.withColumn("rank", row_number().over(wCut))
      .select(col("rank"), col("path"), col("score").as("score_micro"))
  }
}
