package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** Positional-index retrieval tier over the `documents` table: the
  * inverted-index layout, exact phrase search on top of it, and the
  * greedy (temperature-0) decode of the corpus bigram model. These are
  * the lexical-engine primitives (Lucene positions / Manning-Raghavan-
  * Schütze ch. 2 positional postings) that complement the library's
  * score-based retrieval (BM25 / query-likelihood / RRF in
  * [[graft.llm.Retrieval]]).
  *
  * Oracle discipline: token positions are 0-based original split
  * indices on BOTH engines (DuckDB `generate_subscripts` is 1-based →
  * `pos - 1`); empty tokens from trailing separators are dropped after
  * numbering on both sides, so adjacency replays exactly.
  */
object RetrievalQueries {
  import Tables.load

  /** The DuckDB mirror of [[Retrieval.tokenStream]]: 0-based positions,
    * empty tokens dropped after numbering. */
  private val tokSql =
    """tok AS (
      |  SELECT doc_id, term, CAST(pos - 1 AS INT) AS pos FROM (
      |    SELECT doc_id,
      |      unnest(string_split(text, ' ')) AS term,
      |      generate_subscripts(string_split(text, ' '), 1) AS pos
      |    FROM documents)
      |  WHERE term <> '')""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // Positional inverted index: one posting per (term, doc_id) with the
    // sorted occurrence positions and tf — one tokenize scan + one hash
    // aggregation (linear shuffle in token volume; see
    // Retrieval.positionalPostings for the layout rationale). Output
    // discipline: the positions list rides the comparison as a
    // comma-joined string (the harness's canonical sort cannot hash raw
    // list cells — the q_array_funcs rule), exact either way since
    // positions are ints.
    QueryDef(
      "q_index_postings",
      (s, dir) => {
        Retrieval.positionalPostings(load(s, dir, "documents"))
          .select(col("term"), col("doc_id"),
            expr("array_join(transform(positions, p -> cast(p as string)), ',')")
              .as("positions"),
            col("tf"))
          .orderBy(col("term"), col("doc_id"))
      },
      Some(s"""WITH $tokSql
             |SELECT term, doc_id,
             |  array_to_string(list(pos ORDER BY pos), ',') AS positions,
             |  count(*) AS tf
             |FROM tok GROUP BY term, doc_id
             |ORDER BY term, doc_id""".stripMargin)),

    // Exact phrase search ("value table") via position-adjacency joins
    // over postings pruned to the phrase's terms — each join side is
    // bounded by one term's corpus frequency, never the token volume.
    QueryDef(
      "q_retrieval_phrase",
      (s, dir) => {
        Retrieval.phraseMatches(load(s, dir, "documents"),
            Seq("value", "table"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $tokSql
             |SELECT a.doc_id, count(*) AS n_matches
             |FROM tok a JOIN tok b
             |  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             |WHERE a.term = 'value' AND b.term = 'table'
             |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)),

    // Unordered proximity search ("value" within 3 tokens of "table"):
    // the banded-equi-join form — bands of width maxDist+1 make the
    // |posA−posB| ≤ 3 predicate a constant-fanout equi-join (lossless:
    // positions within 3 always land in same-or-adjacent bands), so no
    // inequality join reaches the planner. The oracle states the same
    // predicate directly (DuckDB's IEJoin handles it at oracle scale).
    QueryDef(
      "q_retrieval_proximity",
      (s, dir) => {
        Retrieval.proximityMatches(load(s, dir, "documents"),
            "value", "table", maxDist = 3)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $tokSql
             |SELECT a.doc_id, count(*) AS n_pairs
             |FROM tok a JOIN tok b
             |  ON b.doc_id = a.doc_id
             |  AND abs(a.pos - b.pos) <= 3
             |WHERE a.term = 'value' AND b.term = 'table'
             |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)),

    // Ranking-quality eval battery (nDCG@10 / MRR / recall@10) over the
    // exact cosine retriever, relevance = label agreement: the standard
    // IR eval every retrieval stack reports. Integer-exact — MRR and
    // recall are floor divisions, DCG uses BUILD-TIME 1/log2(rank+1)
    // constants shared verbatim with the generated oracle, so no
    // runtime log2 has to agree cross-engine.
    QueryDef(
      "q_eval_ranking",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val retrieved = graft.llm.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 10), k = 10)
        graft.llm.EvalMetrics.rankingMetrics(
            retrieved, emb.select(col("vec_id"), col("label")), k = 10)
          .orderBy(col("query_id"))
      },
      Some(rankingSql(k = 10))),

    // ANN recall@10 vs the exact retriever — the FAISS-benchmark metric
    // every approximate index deployment tracks. The approximate side
    // here is the fixed-prototype Voronoi ANN (first-8 prototypes,
    // integer-micro dot argmax cells, nprobe=2 — the q_diverse_sample
    // recipe), chosen BECAUSE it replays exactly in SQL (trained-IVF
    // recall is the library path, spec-pinned at nprobe=nlist ≡ exact);
    // in-cell ranking reuses the bit-identical cosine idiom. Recall is
    // set overlap — one equi-join + floor division.
    QueryDef(
      "q_eval_ann_recall",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val exact = graft.llm.Similarity.bruteForceTopK(
          base, base.filter(col("vec_id") < 10), k = 10)
        // fixed-prototype Voronoi cells (integer-micro dot argmax)
        val e = base.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "x")))
        val cent = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c"),
            posexplode(col("embedding").cast("array<double>"))
              .as(Seq("dim", "y")))
        val dp = e.join(broadcast(cent), "dim")
          .groupBy(col("vec_id"), col("c"))
          .agg(sum(floor(col("x") * col("y") * lit(1000000) + lit(0.5))
            .cast("long")).as("dp_micro"))
        val wA = Window.partitionBy(col("vec_id"))
          .orderBy(col("dp_micro").desc, col("c"))
        val ranked = dp.withColumn("rk", row_number().over(wA))
        val cells = ranked.filter(col("rk") === 1)
          .select(col("vec_id").as("cand_id"), col("c").as("cell"))
        val probes = ranked.filter(col("rk") <= 2 && col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("c").as("cell"))
        // in-cell exact cosine top-10 (the bruteForceTopK idiom: norms
        // hoisted, same IEEE order as the oracle's replay)
        val qv = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
          .withColumn("qn", graft.llm.Similarity.l2norm(col("qv")))
        val cv = base
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
          .withColumn("cn", graft.llm.Similarity.l2norm(col("cv")))
        val wR = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        val approx = probes.join(cells, "cell")
          .filter(col("query_id") =!= col("cand_id"))
          .join(qv, "query_id").join(cv, "cand_id")
          .withColumn("cos", graft.llm.Similarity.dot(col("qv"), col("cv"))
            / (col("qn") * col("cn")))
          .withColumn("rk", row_number().over(wR))
          .filter(col("rk") <= 10)
        graft.llm.EvalMetrics.annRecall(exact, approx, k = 10)
          .orderBy(col("query_id"))
      },
      Some("""WITH base AS (
             |  SELECT vec_id, embedding FROM embeddings),
             |sims AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_dot_product(
             |        list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
             |        list_transform(c.embedding, x -> CAST(x AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(q.embedding,
             |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |       * sqrt(list_sum(list_transform(c.embedding,
             |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
             |      AS cos_sim
             |  FROM base q JOIN base c ON c.vec_id <> q.vec_id
             |  WHERE q.vec_id < 10),
             |exact AS (
             |  SELECT query_id, cand_id FROM (
             |    SELECT query_id, cand_id, row_number() OVER (
             |      PARTITION BY query_id
             |      ORDER BY cos_sim DESC, cand_id) AS rk
             |    FROM sims) WHERE rk <= 10),
             |e AS (
             |  SELECT vec_id, i - 1 AS dim,
             |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
             |  FROM base, unnest(generate_series(1, len(embedding)))
             |    AS u(i)),
             |cent AS (
             |  SELECT vec_id AS c, dim, x AS y FROM e WHERE vec_id < 8),
             |dp AS (
             |  SELECT e.vec_id, cent.c,
             |    CAST(sum(CAST(floor(x * y * 1000000 + 0.5) AS BIGINT))
             |      AS BIGINT) AS dp_micro
             |  FROM e JOIN cent USING (dim) GROUP BY e.vec_id, cent.c),
             |rkd AS (
             |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY dp_micro DESC, c) AS rk
             |  FROM dp),
             |cells AS (
             |  SELECT vec_id AS cand_id, c AS cell FROM rkd WHERE rk = 1),
             |probes AS (
             |  SELECT vec_id AS query_id, c AS cell FROM rkd
             |  WHERE rk <= 2 AND vec_id < 10),
             |approx AS (
             |  SELECT query_id, cand_id FROM (
             |    SELECT p.query_id, cl.cand_id, s.cos_sim,
             |      row_number() OVER (PARTITION BY p.query_id
             |        ORDER BY s.cos_sim DESC, cl.cand_id) AS rk
             |    FROM probes p JOIN cells cl USING (cell)
             |    JOIN sims s ON s.query_id = p.query_id
             |      AND s.cand_id = cl.cand_id
             |    WHERE p.query_id <> cl.cand_id) WHERE rk <= 10),
             |hits AS (
             |  SELECT e.query_id, CAST(count(a.cand_id) AS BIGINT)
             |    AS n_overlap
             |  FROM exact e LEFT JOIN approx a
             |    ON a.query_id = e.query_id AND a.cand_id = e.cand_id
             |  GROUP BY e.query_id)
             |SELECT query_id, n_overlap,
             |  n_overlap * 1000000 // 10 AS recall_micro
             |FROM hits ORDER BY query_id""".stripMargin)),

    // Beam-search decode (width 2, 5 steps) of the same bigram model —
    // the width-k generalization of the greedy chain, with cumulative
    // 4-dp-fixed log-probability scores (integer sums after the one ln
    // per edge, the q_retrieval_ql float discipline). The oracle
    // replays all 5 expand-and-cut rounds unrolled.
    QueryDef(
      "q_lm_beam",
      (s, dir) => {
        Retrieval.beamBigramDecode(load(s, dir, "documents"),
            steps = 5, width = 2)
          .orderBy(col("rank"))
      },
      Some(beamSql(steps = 5, width = 2))),

    // Greedy bigram-LM decode: 8 steps from the most frequent
    // document-initial token, each step the highest-count continuation
    // (ties → lexicographically smallest). The oracle replays the exact
    // chain with a recursive CTE over the same argmax table.
    QueryDef(
      "q_lm_generate",
      (s, dir) => {
        Retrieval.greedyBigramChain(load(s, dir, "documents"), steps = 8)
          .orderBy(col("step"))
      },
      Some(s"""WITH RECURSIVE $tokSql,
             |big AS (
             |  SELECT a.term AS prev, b.term AS next, count(*) AS cnt
             |  FROM tok a JOIN tok b
             |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             |  GROUP BY prev, next),
             |am AS (
             |  SELECT prev, next FROM (
             |    SELECT prev, next,
             |      row_number() OVER (PARTITION BY prev
             |                         ORDER BY cnt DESC, next) AS rn
             |    FROM big) WHERE rn = 1),
             |st AS (
             |  SELECT term FROM (
             |    SELECT term, row_number()
             |      OVER (ORDER BY count(*) DESC, term) AS rn
             |    FROM tok WHERE pos = 0 GROUP BY term) WHERE rn = 1),
             |g AS (
             |  SELECT CAST(0 AS INT) AS step, term AS word FROM st
             |  UNION ALL
             |  SELECT CAST(g.step + 1 AS INT), am.next
             |  FROM g JOIN am ON am.prev = g.word WHERE g.step < 7)
             |SELECT step, word FROM g ORDER BY step""".stripMargin)),
  )

  /** Unrolled DuckDB replay of [[Retrieval.beamBigramDecode]]: the lp
    * model, the start beam, then `steps` (expand → width-cut) rounds. */
  private def beamSql(steps: Int, width: Int): String = {
    val head =
      s"""WITH $tokSql,
         |big AS (
         |  SELECT a.term AS prev, b.term AS next, count(*) AS cnt
         |  FROM tok a JOIN tok b
         |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |  GROUP BY prev, next),
         |tots AS (
         |  SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot
         |  FROM big GROUP BY prev),
         |lp AS (
         |  SELECT prev, next,
         |    CAST(round(round(ln(CAST(cnt AS DOUBLE) / tot), 4) * 10000)
         |      AS BIGINT) AS lp
         |  FROM big JOIN tots USING (prev)),
         |b0 AS (
         |  SELECT term AS path, term AS last,
         |    CAST(0 AS BIGINT) AS score
         |  FROM (
         |    SELECT term, row_number()
         |      OVER (ORDER BY count(*) DESC, term) AS rn
         |    FROM tok WHERE pos = 0 GROUP BY term) WHERE rn = 1)""".stripMargin
    val rounds = (1 to steps).map { i =>
      s"""c$i AS (
         |  SELECT b.path || ' ' || m.next AS path, m.next AS last,
         |    b.score + m.lp AS score
         |  FROM b${i - 1} b JOIN lp m ON m.prev = b.last),
         |b$i AS (
         |  SELECT path, last, score FROM (
         |    SELECT path, last, score, row_number()
         |      OVER (ORDER BY score DESC, path) AS rn
         |    FROM c$i) WHERE rn <= $width)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rounds
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, path) AS INT)
       |    AS rank,
       |  path, score AS score_micro
       |FROM b$steps ORDER BY rank""".stripMargin
  }

  /** DuckDB replay of [[graft.llm.EvalMetrics.rankingMetrics]] over the
    * exact cosine retriever: the q_sim_topk cosine CTE, then the metric
    * battery with the SAME build-time gain constants. */
  private def rankingSql(k: Int): String = {
    val gains = graft.llm.EvalMetrics.NdcgGains.take(k)
    val prefix = graft.llm.EvalMetrics.NdcgGainPrefix.take(k)
    val gainsVals = gains.zipWithIndex
      .map { case (g, i) => s"(${i + 1}, ${g})" }.mkString(", ")
    val prefixVals = prefix.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${c})" }.mkString(", ")
    s"""WITH sims AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    q.label AS q_label, c.label AS c_label,
       |    list_dot_product(
       |        list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
       |        list_transform(c.embedding, x -> CAST(x AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(q.embedding,
       |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(c.embedding,
       |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
       |      AS cos_sim
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT query_id, cand_id, q_label, c_label,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, cand_id) AS rk
       |  FROM sims),
       |g(rk, gain) AS (VALUES $gainsVals),
       |pfx(n, cum) AS (VALUES $prefixVals),
       |lc AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS label_n
       |  FROM embeddings GROUP BY label),
       |rel AS (
       |  SELECT r.query_id, r.rk,
       |    CASE WHEN r.q_label = r.c_label
       |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rel,
       |    CAST(g.gain AS BIGINT) AS gain
       |  FROM ranked r JOIN g ON g.rk = r.rk
       |  WHERE r.rk <= $k),
       |agg AS (
       |  SELECT query_id,
       |    CAST(sum(rel) AS BIGINT) AS hits,
       |    min(CASE WHEN rel = 1 THEN rk END) AS first_rel,
       |    CAST(sum(rel * gain) AS BIGINT) AS dcg
       |  FROM rel GROUP BY query_id),
       |n AS (
       |  SELECT e.vec_id AS query_id, lc.label_n - 1 AS n_rel
       |  FROM embeddings e JOIN lc ON lc.label = e.label
       |  WHERE e.vec_id < 10)
       |SELECT a.query_id, n.n_rel, a.hits,
       |  CASE WHEN a.first_rel IS NULL THEN CAST(0 AS BIGINT)
       |       ELSE 1000000 // CAST(a.first_rel AS BIGINT) END AS mrr_micro,
       |  CASE WHEN n.n_rel = 0 THEN CAST(0 AS BIGINT)
       |       ELSE a.hits * 1000000 // n.n_rel END AS recall_micro,
       |  CASE WHEN n.n_rel = 0 THEN CAST(0 AS BIGINT)
       |       ELSE a.dcg * 1000000
       |         // (SELECT CAST(cum AS BIGINT) FROM pfx
       |             WHERE pfx.n = least(n.n_rel, $k)) END AS ndcg_micro
       |FROM agg a JOIN n USING (query_id)
       |ORDER BY a.query_id""".stripMargin
  }
}
