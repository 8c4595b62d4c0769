package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Featurize, Similarity}

/** Corpus-mining operators: model-free hashed TF-IDF featurization,
  * margin-based aligned-pair mining, and soft (reweighting) dedup. All
  * three oracles are FULL replays — the md5 feature hash, the 4-dp
  * fixed-point cosine, and the exact integer divisions evaluate
  * bit-identically in DuckDB.
  */
object MiningQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Hashed TF-IDF document vectors (the hashing trick, Weinberger et
    // al. 2009) at dim=32 over the documents table: sparse (doc, dim,
    // weight) rows, sklearn smooth-idf in 1e4 fixed point, signed-hash
    // collision balancing. The oracle recomputes tokenization, df/idf,
    // the md5 feature index AND sign, and the component rollup.
    QueryDef(
      "q_embed_hashed_tfidf",
      (s, dir) => Featurize.hashedTfidf(load(s, dir, "documents"), dim = 32)
        .orderBy(col("doc_id"), col("dim")),
      Some("""WITH toks AS (
             |  SELECT doc_id, t.term
             |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
             |  WHERE t.term <> ''),
             |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
             |dft AS (
             |  SELECT term, count(DISTINCT doc_id) AS df
             |  FROM toks GROUP BY term),
             |idf AS (
             |  SELECT term,
             |    CAST(round(round(ln(CAST(n + 1 AS DOUBLE)
             |                        / CAST(df + 1 AS DOUBLE)), 4)
             |               * 10000) AS BIGINT) + 10000 AS idf_micro
             |  FROM dft, nn),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf
             |  FROM toks GROUP BY doc_id, term),
             |w AS (
             |  SELECT doc_id,
             |    CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 32 AS dim,
             |    (CASE WHEN substr(md5(term), 9, 1) IN
             |            ('0','1','2','3','4','5','6','7')
             |          THEN 1 ELSE -1 END) * tf * idf_micro AS w
             |  FROM tf JOIN idf USING (term))
             |SELECT doc_id, dim, CAST(sum(w) AS BIGINT) AS w_micro
             |FROM w GROUP BY doc_id, dim
             |HAVING sum(w) <> 0
             |ORDER BY doc_id, dim""".stripMargin)),

    // Margin-based pair mining (Artetxe & Schwenk 2019, ratio variant,
    // forward strategy): harvest the top-50 aligned candidates between
    // the label-0 and label-1 embedding sets, each candidate's cosine
    // normalized by its endpoints' k=4 neighbourhood averages — the
    // hubness correction raw cosine lacks. Full replay: 4-dp fixed-point
    // cosines, integer neighbourhood sums, one exact integer division.
    QueryDef(
      "q_sim_margin_pairs",
      (s, dir) => {
        val emb = load(s, dir, "embeddings")
        Similarity.marginPairs(
          emb.filter(col("label") === 0), emb.filter(col("label") === 1),
          k = 4, topN = 50)
      },
      Some("""WITH s AS (
             |  SELECT vec_id AS src_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings WHERE label = 0),
             |t AS (
             |  SELECT vec_id AS tgt_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings WHERE label = 1),
             |p AS MATERIALIZED (
             |  SELECT src_id, tgt_id,
             |    CAST(round(round(
             |      list_dot_product(s.v, t.v)
             |        / (sqrt(list_sum(list_transform(s.v, x -> x * x)))
             |         * sqrt(list_sum(list_transform(t.v, x -> x * x)))),
             |      4) * 10000) AS BIGINT) AS c_micro
             |  FROM s, t),
             |fwd AS (
             |  SELECT src_id, tgt_id, c_micro FROM (
             |    SELECT src_id, tgt_id, c_micro,
             |      row_number() OVER (PARTITION BY src_id
             |                         ORDER BY c_micro DESC, tgt_id) AS rk
             |    FROM p) q WHERE rk <= 4),
             |bwd AS (
             |  SELECT src_id, tgt_id, c_micro FROM (
             |    SELECT src_id, tgt_id, c_micro,
             |      row_number() OVER (PARTITION BY tgt_id
             |                         ORDER BY c_micro DESC, src_id) AS rk
             |    FROM p) q WHERE rk <= 4),
             |sx AS (SELECT src_id, sum(c_micro) AS sum_x FROM fwd GROUP BY src_id),
             |sy AS (SELECT tgt_id, sum(c_micro) AS sum_y FROM bwd GROUP BY tgt_id),
             |m AS (
             |  SELECT f.src_id, f.tgt_id, f.c_micro,
             |    CAST((f.c_micro * 8 * 1000000) // (sum_x + sum_y) AS BIGINT) AS margin_micro
             |  FROM fwd f JOIN sx USING (src_id) JOIN sy USING (tgt_id)
             |  WHERE f.c_micro >= 0 AND sum_x + sum_y > 0)
             |SELECT src_id, tgt_id, c_micro, margin_micro FROM m
             |ORDER BY margin_micro DESC, src_id, tgt_id
             |LIMIT 50""".stripMargin)),

    // Margin mining on the ANN tier (Similarity.marginPairsAnn) — the
    // production path the exact query above anchors: candidates from
    // nprobe-cell IVF probing in BOTH directions, same integer margin
    // tail. In-plan twin gate (the q_sim_ivf discipline — k-means
    // centroids are not expressible in portable SQL): exact copies of
    // the label-0 vectors with vec_id < 100 are planted into the
    // label-1 target side at vec_id + 100000; identical vectors share
    // centroid-score arrays, so each twin sits in its source's probe-#1
    // cell — guaranteed candidacy, cosine 1.0 (c_micro 10000), and a
    // margin far above any background pair (measured background cross-
    // and intra-label cosines cap at 0.51 across sf0.001-0.1, putting
    // the worst twin margin at ~1.58e6 vs the 1.4e6 bar). One boolean
    // per planted source; the oracle matches literal TRUE.
    QueryDef(
      "q_sim_margin_ann",
      (s, dir) => {
        val emb = load(s, dir, "embeddings")
        val src = emb.filter(col("label") === 0)
          .select("vec_id", "embedding")
        val planted = src.filter(col("vec_id") < 100)
        val tgt = emb.filter(col("label") === 1)
          .select("vec_id", "embedding")
          .unionByName(planted.select(
            (col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        val mined = Similarity.marginPairsAnn(src, tgt, k = 4, topN = 60,
          nlist = 16, nprobe = 4)
        val ok = mined.filter(col("tgt_id") === col("src_id") + 100000L
            && col("c_micro") === 10000L
            && col("margin_micro") >= 1400000L)
          .select(col("src_id"), lit(true).as("ok"))
        planted.select(col("vec_id").as("src_id"))
          .join(ok, Seq("src_id"), "left")
          .select(col("src_id"),
            coalesce(col("ok"), lit(false)).as("twin_mined"))
          .orderBy(col("src_id"))
      },
      Some("""SELECT vec_id AS src_id, true AS twin_mined
             |FROM embeddings WHERE label = 0 AND vec_id < 100
             |ORDER BY src_id""".stripMargin)),

    // Margin mining over PERSISTED IVF indexes — the production
    // refresh shape (daily bitext re-mines against corpora whose
    // indexes were built once): both sides write as cell-partitioned
    // indexes (full lifecycle per run, the q_sim_ivf_indexed rule),
    // then mining reads ONLY postings + centroids — no re-training, no
    // re-assignment, norms straight from the index. Same twin gate and
    // bar as q_sim_margin_ann; candidates/scoring/margin tail are
    // shared code, so the two paths cannot drift.
    QueryDef(
      "q_sim_margin_indexed",
      (s, dir) => {
        val emb = load(s, dir, "embeddings")
        val src = emb.filter(col("label") === 0)
          .select("vec_id", "embedding")
        val planted = src.filter(col("vec_id") < 100)
        val tgt = emb.filter(col("label") === 1)
          .select("vec_id", "embedding")
          .unionByName(planted.select(
            (col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        val si = s"${graft.core.Fs.scratchRoot}/margin_src_idx"
        val ti = s"${graft.core.Fs.scratchRoot}/margin_tgt_idx"
        Similarity.writeIvfIndex(src, si, nlist = 16)
        Similarity.writeIvfIndex(tgt, ti, nlist = 16)
        val mined = Similarity.marginPairsIndexed(s, si, ti,
          k = 4, topN = 60, nprobe = 4)
        val ok = mined.filter(col("tgt_id") === col("src_id") + 100000L
            && col("c_micro") === 10000L
            && col("margin_micro") >= 1400000L)
          .select(col("src_id"), lit(true).as("ok"))
        planted.select(col("vec_id").as("src_id"))
          .join(ok, Seq("src_id"), "left")
          .select(col("src_id"),
            coalesce(col("ok"), lit(false)).as("twin_mined"))
          .orderBy(col("src_id"))
      },
      Some("""SELECT vec_id AS src_id, true AS twin_mined
             |FROM embeddings WHERE label = 0 AND vec_id < 100
             |ORDER BY src_id""".stripMargin)),

    // Soft dedup (SoftDeDup, He et al. 2024): 1/frequency sampling
    // weights over exact-duplicate groups instead of removal — every
    // value an exact BIGINT (weight and effective token mass in
    // micro-units); the oracle replays grouping, weights, and token
    // counts.
    QueryDef(
      "q_dedup_soft",
      (s, dir) => Dedup.softDedupWeights(load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH h AS (
             |  SELECT doc_id, md5(text) AS th,
             |    CAST(len(list_filter(string_split(text, ' '),
             |                         t -> t <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |g AS (SELECT th, count(*) AS dup_cnt FROM h GROUP BY th)
             |SELECT doc_id, dup_cnt,
             |  1000000 // dup_cnt AS weight_micro,
             |  n_tokens * (1000000 // dup_cnt) AS eff_tokens_micro
             |FROM h JOIN g USING (th)
             |ORDER BY doc_id""".stripMargin)),
  )
}
