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
}
