package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, EvalMetrics, Linkage, Privacy}

/** Round-12 session-2 curation tier: paragraph-level dedup (Dolma),
  * privacy audits (k-anonymity / l-diversity), record linkage, and
  * corpus-law diagnostics. Every oracle is a FULL replay in DuckDB —
  * exact-integer counts and 4-dp fixed-point logs, never planted values.
  */
object CurationQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Paragraph-level exact dedup with document rebuild (Dolma, Soldaini
    // et al. 2024): duplicated paragraphs (20-token blocks here — the
    // corpus carries no newlines) survive only at their minimum
    // (doc_id, pos) occurrence; each doc reports total/kept paragraph
    // counts and its rebuilt text. The oracle replays chunking, the
    // first-occurrence window, and the ordered rebuild; at sf0.01 the
    // corpus carries ~50 naturally-repeated paragraphs, so the result is
    // non-vacuous without a fixture.
    QueryDef(
      "q_dedup_paragraphs",
      (s, dir) => Dedup.paragraphDedup(load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '),
             |                             t -> t <> '') AS ts
             |  FROM documents),
             |paras AS (
             |  SELECT doc_id, CAST((s.x - 1) // 20 AS BIGINT) AS pos,
             |         array_to_string(ts[s.x : s.x + 19], ' ') AS para
             |  FROM toks,
             |       unnest(range(1, greatest(len(ts), 1) + 1, 20)) AS s(x)),
             |k AS (
             |  SELECT doc_id, pos, para,
             |    row_number() OVER (PARTITION BY md5(para)
             |                       ORDER BY doc_id, pos) AS rk
             |  FROM paras)
             |SELECT doc_id,
             |  count(*) AS n_paras,
             |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept,
             |  coalesce(string_agg(CASE WHEN rk = 1 THEN para END, ' '
             |                      ORDER BY pos), '') AS clean_text
             |FROM k GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    // FUZZY paragraph dedup (the MinHash half of Dolma's paragraph
    // rule): the same 20-token chunker feeds the banded-MinHash
    // candidate machinery over paragraph text. In-plan twin gate (the
    // q_dedup_minhash discipline — the affine MinHash family is not
    // expressible in portable SQL): each source doc < 100 gets a
    // planted companion (id + 100000) whose SECOND paragraph is a
    // verbatim copy of the source's FIRST, behind 20 filler tokens of
    // its own — a cross-document repeated paragraph inside otherwise
    // unrelated text, exactly the case document-level MinHash dilutes
    // away and paragraph granularity exists to catch. Identical
    // paragraph text ⇒ identical signature ⇒ every band collides, so
    // the (src pos 0, twin pos 1) pair must surface at est_jaccard 1.0.
    QueryDef(
      "q_dedup_paragraphs_fuzzy",
      (s, dir) => {
        val docs = load(s, dir, "documents")
          .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
        val para0 = array_join(slice(
          filter(split(col("text"), " "), t => t =!= ""), 1, 20), " ")
        val filler = array_join(transform(sequence(lit(0), lit(19)),
          j => concat(lit("f"), col("doc_id"), lit("x"), j)), " ")
        val planted = docs.select((col("doc_id") + 100000L).as("doc_id"),
          concat(filler, lit(" "), para0).as("text"))
        val pairs = Dedup.paragraphMinhashPairs(
          docs.unionByName(planted), paraTokens = 20,
          numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.8)
        val hit = pairs.filter(col("d2") === col("d1") + 100000L
            && col("p1") === 0L && col("p2") === 1L
            && col("est_jaccard") === 1.0)
          .select(col("d1").as("doc_id"), lit(true).as("ok"))
        docs.select("doc_id")
          .join(hit, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("ok"), lit(false)).as("copy_found"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, true AS copy_found
             |FROM documents WHERE doc_id < 100
             |ORDER BY doc_id""".stripMargin)),

    // Compression-ratio quality signal (the published deflate filter:
    // templated/repetitive text compresses far below natural prose,
    // near-random noise barely compresses). DEFLATE is not
    // SQL-expressible, so the gate plants both failure modes per
    // source doc — an 80×-repeated-token doc and a 512-hex-char md5
    // doc — and checks threshold verdicts with huge margins (measured:
    // repeats land ≤ 0.045, hex noise 0.55-0.57, bars at 0.15/0.30),
    // so a zlib revision cannot flip a verdict. Raw-length ordering
    // and determinism stay pinned in LlmSpec.
    QueryDef(
      "q_quality_compress",
      (s, dir) => {
        val docs = load(s, dir, "documents").filter(col("doc_id") < 100)
        val firstTok = coalesce(element_at(
          filter(split(col("text"), " "), t => t =!= ""), 1), lit("x"))
        val rep = docs.select((col("doc_id") + 100000L).as("doc_id"),
          array_join(array_repeat(firstTok, 80), " ").as("text"))
        val rnd = docs.select((col("doc_id") + 200000L).as("doc_id"),
          concat((0 until 16).map(j =>
            md5(concat(col("doc_id").cast("string"), lit(s":$j")))): _*)
            .as("text"))
        val r = graft.llm.TextAnalysis.compressionRatio(
          docs.select(col("doc_id"), col("text"))
            .unionByName(rep).unionByName(rnd))
        r.select((col("doc_id") % 100000L).as("src_id"),
            expr("doc_id div 100000").as("kind"), col("ratio_micro"))
          .groupBy(col("src_id"))
          .agg(
            max(when(col("kind") === 1, col("ratio_micro"))).as("rep_r"),
            max(when(col("kind") === 2, col("ratio_micro"))).as("rnd_r"))
          .select(col("src_id").as("doc_id"),
            (col("rep_r") < 150000L).as("rep_flagged"),
            (col("rnd_r") >= 300000L).as("rnd_clean"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, true AS rep_flagged, true AS rnd_clean
             |FROM documents WHERE doc_id < 100
             |ORDER BY doc_id""".stripMargin)),

    // k-anonymity audit (Sweeney 2002) over the customer table's
    // (nation, market-segment) quasi-identifier: per-class sizes and the
    // k=10 verdict. At sf0.01 the 125 classes range 5..19 rows, so both
    // verdicts appear. One hash aggregate — exact integers end to end.
    QueryDef(
      "q_privacy_kanon",
      (s, dir) => Privacy.kAnonymity(load(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 10)
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  count(*) AS class_size,
             |  count(*) >= 10 AS k_anon
             |FROM customer GROUP BY c_nationkey, c_mktsegment
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // Distinct l-diversity audit (Machanavajjhala et al. 2007): a
    // k-anonymous class still leaks when its sensitive values collapse —
    // here the sensitive attribute is the $1000 account-balance band and
    // the bar is l=5 distinct bands per class (classes carry 4..10, so
    // both verdicts appear). The band is floor(x/1000): two IEEE ops that
    // evaluate bit-identically on both engines.
    QueryDef(
      "q_privacy_ldiversity",
      (s, dir) => Privacy.lDiversity(load(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long"), l = 5)
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  count(*) AS class_size,
             |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
             |    AS n_sensitive,
             |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 5
             |    AS l_diverse
             |FROM customer GROUP BY c_nationkey, c_mktsegment
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // Datafly-style generalization walk (Sweeney 2002): climb the
    // full-domain ladder (nation, segment) -> (nation, *) -> (*, *) to
    // the FIRST rung whose minimum class size reaches k=20. At sf0.01
    // rung 0's minimum is 5 and per-nation minimums are >= 43, so rung 1
    // is chosen — the oracle replays the rung choice (two scalar
    // subqueries) and the class table at every branch.
    QueryDef(
      "q_privacy_generalize",
      (s, dir) => Privacy.generalizeToK(load(s, dir, "customer"),
          Seq(
            Seq("qi_nation" -> col("c_nationkey").cast("string"),
              "qi_segment" -> col("c_mktsegment")),
            Seq("qi_nation" -> col("c_nationkey").cast("string"),
              "qi_segment" -> lit("*")),
            Seq("qi_nation" -> lit("*"), "qi_segment" -> lit("*"))),
          k = 20)
        .orderBy(col("qi_nation"), col("qi_segment")),
      Some("""WITH m0 AS (
             |  SELECT min(c) AS m FROM (
             |    SELECT count(*) AS c FROM customer
             |    GROUP BY c_nationkey, c_mktsegment)),
             |m1 AS (
             |  SELECT min(c) AS m FROM (
             |    SELECT count(*) AS c FROM customer GROUP BY c_nationkey)),
             |pick AS (
             |  SELECT CASE WHEN (SELECT m FROM m0) >= 20 THEN 0
             |              WHEN (SELECT m FROM m1) >= 20 THEN 1
             |              ELSE 2 END AS rung)
             |SELECT * FROM (
             |  SELECT * FROM (
             |    SELECT CAST(c_nationkey AS VARCHAR) AS qi_nation,
             |           c_mktsegment AS qi_segment,
             |           count(*) AS class_size, CAST(0 AS BIGINT) AS rung
             |    FROM customer GROUP BY c_nationkey, c_mktsegment)
             |  WHERE (SELECT rung FROM pick) = 0
             |  UNION ALL
             |  SELECT * FROM (
             |    SELECT CAST(c_nationkey AS VARCHAR), '*', count(*),
             |           CAST(1 AS BIGINT)
             |    FROM customer GROUP BY c_nationkey)
             |  WHERE (SELECT rung FROM pick) = 1
             |  UNION ALL
             |  SELECT * FROM (
             |    SELECT '*', '*', count(*), CAST(2 AS BIGINT)
             |    FROM customer)
             |  WHERE (SELECT rung FROM pick) = 2)
             |ORDER BY qi_nation, qi_segment""".stripMargin)),

    // Record linkage / entity resolution (merge/purge, Hernández &
    // Stolfo 1995): a noisy-entity fixture derived from customer — every
    // custkey < 300 becomes an entity named segment-md5hex8 (md5 spreads
    // non-twin neighbours ~8 edits apart) and every 5th gets a twin with
    // the LAST character flipped (so the twin sorts adjacent to its
    // base). Sorted-neighborhood window 3, levenshtein <= 2, connected
    // components; singletons keep their own id. FULL replay: the oracle
    // rebuilds the fixture, the rank window, the exact edit distance, and
    // the transitive closure.
    QueryDef(
      "q_entity_resolution",
      (s, dir) => {
        val ents = entityFixture(load(s, dir, "customer"))
        Linkage.resolveEntities(ents, "ent_id", "name",
            window = 3, maxDist = 2)
          .orderBy(col("ent_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT c_custkey AS ent_id,
             |    c_mktsegment || '-' ||
             |      substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS name
             |  FROM customer WHERE c_custkey < 300),
             |twin AS (
             |  SELECT ent_id + 100000 AS ent_id,
             |    substr(name, 1, len(name) - 1) || 'x' AS name
             |  FROM base WHERE ent_id % 5 = 0),
             |ents AS (
             |  SELECT * FROM base UNION ALL SELECT * FROM twin),
             |rk AS (
             |  SELECT ent_id, name,
             |    row_number() OVER (ORDER BY name, ent_id) - 1 AS r
             |  FROM ents),
             |pairs AS (
             |  SELECT a.ent_id AS d1, b.ent_id AS d2
             |  FROM rk a JOIN rk b ON b.r > a.r AND b.r <= a.r + 2
             |  WHERE levenshtein(a.name, b.name) <= 2),
             |edges AS (
             |  SELECT d1 AS n1, d2 AS n2 FROM pairs
             |  UNION ALL SELECT d2, d1 FROM pairs),
             |reach AS (
             |  SELECT n1 AS node, n1 AS lbl FROM edges
             |  UNION
             |  SELECT e.n2 AS node, r.lbl
             |  FROM reach r JOIN edges e ON e.n1 = r.node),
             |cl AS (
             |  SELECT node AS ent_id, min(lbl) AS cluster_id
             |  FROM reach GROUP BY node)
             |SELECT e.ent_id,
             |  CAST(coalesce(cl.cluster_id, e.ent_id) AS BIGINT)
             |    AS cluster_id
             |FROM ents e LEFT JOIN cl USING (ent_id)
             |ORDER BY ent_id""".stripMargin)),

    // Winnowing fingerprints (MOSS, Schleimer et al. 2003): per-doc
    // selected minima of 3-gram hashes over 4-hash windows — the
    // shift-resistant, ~2/(w+1)-density document signature. Full replay:
    // the oracle recomputes gram hashes, window minima, and the
    // per-doc distinct set.
    QueryDef(
      "q_text_winnow",
      (s, dir) => Dedup.winnowFingerprints(load(s, dir, "documents"))
        .orderBy(col("doc_id"), col("fp")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS ts
             |  FROM documents),
             |hs AS (
             |  SELECT doc_id,
             |    list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
             |      i -> CAST('0x' || substr(md5(
             |             array_to_string(ts[i : i + 2], ' ')), 1, 15)
             |           AS BIGINT)) AS hs
             |  FROM toks),
             |wins AS (
             |  SELECT doc_id,
             |    list_transform(
             |      range(1, greatest(len(hs) - 3, least(len(hs), 1)) + 1),
             |      j -> list_min(hs[j : j + 3])) AS ws
             |  FROM hs)
             |SELECT DISTINCT doc_id, f.fp AS fp
             |FROM wins, unnest(ws) AS f(fp)
             |ORDER BY doc_id, fp""".stripMargin)),

    // Winnowing near-dup candidates: docs sharing >= 3 fingerprints via
    // the inverted fingerprint index (df-capped at 20 — the stopword
    // rule), the MOSS pairing step. At sf0.01: 25 candidate pairs off
    // ~7k distinct fingerprints, zero hot ones.
    QueryDef(
      "q_dedup_winnow",
      (s, dir) => Dedup.winnowPairs(load(s, dir, "documents"))
        .orderBy(col("d1"), col("d2")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS ts
             |  FROM documents),
             |hs AS (
             |  SELECT doc_id,
             |    list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
             |      i -> CAST('0x' || substr(md5(
             |             array_to_string(ts[i : i + 2], ' ')), 1, 15)
             |           AS BIGINT)) AS hs
             |  FROM toks),
             |wins AS (
             |  SELECT doc_id,
             |    list_transform(
             |      range(1, greatest(len(hs) - 3, least(len(hs), 1)) + 1),
             |      j -> list_min(hs[j : j + 3])) AS ws
             |  FROM hs),
             |fps AS (
             |  SELECT DISTINCT doc_id, f.fp AS fp
             |  FROM wins, unnest(ws) AS f(fp)),
             |rare AS (
             |  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20)
             |SELECT a.doc_id AS d1, b.doc_id AS d2,
             |  count(*) AS n_shared
             |FROM fps a JOIN rare USING (fp) JOIN fps b USING (fp)
             |WHERE a.doc_id < b.doc_id
             |GROUP BY a.doc_id, b.doc_id
             |HAVING count(*) >= 3
             |ORDER BY d1, d2""".stripMargin)),

    // Content-defined chunking (LBFS boundary rule): chunk boundaries
    // where the 3-gram hash % 8 == 0 — position-independent chunks that
    // re-synchronize after insertions, the dedup complement of the
    // FIXED 20-token paragraphs. Full replay of gram hashes, the
    // boundary filter, span assembly, and chunk hashing.
    QueryDef(
      "q_chunk_cdc",
      (s, dir) => Dedup.cdcChunks(load(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS ts
             |  FROM documents),
             |hs AS (
             |  SELECT doc_id, ts,
             |    list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
             |      i -> CAST('0x' || substr(md5(
             |             array_to_string(ts[i : i + 2], ' ')), 1, 15)
             |           AS BIGINT)) AS hs
             |  FROM toks),
             |cuts AS (
             |  SELECT doc_id, ts,
             |    list_filter(range(3, len(ts) + 1),
             |      i -> hs[CAST(i AS INT) - 2] % 8 = 0) AS cs
             |  FROM hs),
             |spans AS (
             |  SELECT doc_id, ts,
             |    list_prepend(CAST(1 AS BIGINT),
             |      list_transform(cs, c -> c + 1)) AS starts,
             |    list_append(cs, CAST(len(ts) AS BIGINT)) AS ends
             |  FROM cuts),
             |chunks AS (
             |  SELECT doc_id, ts, u.i AS chunk_idx,
             |    starts[u.i] AS s, ends[u.i] AS e
             |  FROM spans, unnest(range(1, len(starts) + 1)) AS u(i)
             |  WHERE ends[u.i] >= starts[u.i])
             |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             |  CAST(e - s + 1 AS BIGINT) AS n_tokens,
             |  array_to_string(ts[s : e], ' ') AS chunk,
             |  md5(array_to_string(ts[s : e], ' ')) AS chunk_hash
             |FROM chunks
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // CDC chunk dedup summary: the duplicated content-defined chunks
    // across the corpus (246 groups at sf0.01) — what a byte-level
    // dedup store would collapse. One hash aggregate over the chunk
    // table; keyed by the canonical minimum (doc, idx) occurrence.
    QueryDef(
      "q_dedup_cdc",
      (s, dir) => Dedup.cdcChunks(load(s, dir, "documents"))
        .groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("dup_cnt"),
          min(struct(col("doc_id"), col("chunk_idx"))).as("w"),
          min(col("n_tokens")).as("n_tokens"))
        .filter(col("dup_cnt") > 1)
        .select(col("chunk_hash"), col("dup_cnt"),
          col("w.doc_id").as("first_doc"),
          col("w.chunk_idx").as("first_idx"), col("n_tokens"))
        .orderBy(col("chunk_hash")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS ts
             |  FROM documents),
             |hs AS (
             |  SELECT doc_id, ts,
             |    list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
             |      i -> CAST('0x' || substr(md5(
             |             array_to_string(ts[i : i + 2], ' ')), 1, 15)
             |           AS BIGINT)) AS hs
             |  FROM toks),
             |cuts AS (
             |  SELECT doc_id, ts,
             |    list_filter(range(3, len(ts) + 1),
             |      i -> hs[CAST(i AS INT) - 2] % 8 = 0) AS cs
             |  FROM hs),
             |spans AS (
             |  SELECT doc_id, ts,
             |    list_prepend(CAST(1 AS BIGINT),
             |      list_transform(cs, c -> c + 1)) AS starts,
             |    list_append(cs, CAST(len(ts) AS BIGINT)) AS ends
             |  FROM cuts),
             |chunks AS (
             |  SELECT doc_id, u.i AS chunk_idx,
             |    CAST(ends[u.i] - starts[u.i] + 1 AS BIGINT) AS n_tokens,
             |    md5(array_to_string(ts[starts[u.i] : ends[u.i]], ' '))
             |      AS chunk_hash
             |  FROM spans, unnest(range(1, len(starts) + 1)) AS u(i)
             |  WHERE ends[u.i] >= starts[u.i])
             |SELECT chunk_hash, dup_cnt, first_doc,
             |  CAST(first_idx AS BIGINT) AS first_idx, n_tokens
             |FROM (
             |  SELECT chunk_hash,
             |    count(*) OVER (PARTITION BY chunk_hash) AS dup_cnt,
             |    doc_id AS first_doc, chunk_idx AS first_idx,
             |    CAST(min(n_tokens) OVER (PARTITION BY chunk_hash)
             |      AS BIGINT) AS n_tokens,
             |    row_number() OVER (PARTITION BY chunk_hash
             |                       ORDER BY doc_id, chunk_idx) AS rk
             |  FROM chunks)
             |WHERE rk = 1 AND dup_cnt > 1
             |ORDER BY chunk_hash""".stripMargin)),

    // Corpus-level BLEU-4 (Papineni et al. 2002) — the eval-side scoring
    // metric next to the decontamination gates: candidates are the
    // references with every 7th token dropped (a deterministic,
    // oracle-replayable "model output"), clipped n-gram precisions pooled
    // over doc_id < 120, geometric mean + brevity penalty in the ln →
    // 4 dp → micro-unit discipline. The oracle replays tokenization, the
    // per-n gram explosion, clipping, and every fixed-point step.
    QueryDef(
      "q_eval_bleu",
      (s, dir) => {
        val refs = load(s, dir, "documents").filter(col("doc_id") < 120)
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)"), " ").as("cand"))
        EvalMetrics.corpusBleu(refs, maxN = 4)
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS pid,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS rt
             |  FROM documents WHERE doc_id < 120),
             |t AS (
             |  SELECT pid, rt,
             |    list_filter(rt, (x, i) -> i % 7 != 0) AS ct FROM p),
             |lens AS (
             |  SELECT CAST(sum(len(rt)) AS BIGINT) AS r_len,
             |         CAST(sum(len(ct)) AS BIGINT) AS c_len FROM t),
             |cg AS (
             |  SELECT pid, n.n AS n,
             |         CAST('0x' || substr(md5(
             |           array_to_string(ct[s.i : s.i + n.n - 1], ' ')),
             |           1, 15) AS BIGINT) AS gh
             |  FROM t, (VALUES (1), (2), (3), (4)) n(n),
             |       unnest(range(1, greatest(len(ct) - n.n + 1, 0) + 1))
             |         AS s(i)),
             |rg AS (
             |  SELECT pid, n.n AS n,
             |         CAST('0x' || substr(md5(
             |           array_to_string(rt[s.i : s.i + n.n - 1], ' ')),
             |           1, 15) AS BIGINT) AS gh
             |  FROM t, (VALUES (1), (2), (3), (4)) n(n),
             |       unnest(range(1, greatest(len(rt) - n.n + 1, 0) + 1))
             |         AS s(i)),
             |cc AS (SELECT pid, n, gh, count(*) AS ccnt
             |       FROM cg GROUP BY pid, n, gh),
             |rc AS (SELECT pid, n, gh, count(*) AS rcnt
             |       FROM rg GROUP BY pid, n, gh),
             |pn AS (
             |  SELECT n,
             |    CAST(sum(least(ccnt, coalesce(rcnt, 0))) AS BIGINT) AS m,
             |    CAST(sum(ccnt) AS BIGINT) AS tot
             |  FROM cc LEFT JOIN rc USING (pid, n, gh) GROUP BY n),
             |wide AS (
             |  SELECT
             |    max(CASE WHEN n = 1 THEN m END) AS match_1,
             |    max(CASE WHEN n = 1 THEN tot END) AS total_1,
             |    max(CASE WHEN n = 2 THEN m END) AS match_2,
             |    max(CASE WHEN n = 2 THEN tot END) AS total_2,
             |    max(CASE WHEN n = 3 THEN m END) AS match_3,
             |    max(CASE WHEN n = 3 THEN tot END) AS total_3,
             |    max(CASE WHEN n = 4 THEN m END) AS match_4,
             |    max(CASE WHEN n = 4 THEN tot END) AS total_4
             |  FROM pn),
             |lns AS (
             |  SELECT *,
             |    CASE WHEN match_1 = 0 THEN 0 ELSE CAST(round(round(
             |      ln(CAST(match_1 AS DOUBLE) / CAST(total_1 AS DOUBLE)),
             |      4) * 10000) AS BIGINT) END AS ln_1,
             |    CASE WHEN match_2 = 0 THEN 0 ELSE CAST(round(round(
             |      ln(CAST(match_2 AS DOUBLE) / CAST(total_2 AS DOUBLE)),
             |      4) * 10000) AS BIGINT) END AS ln_2,
             |    CASE WHEN match_3 = 0 THEN 0 ELSE CAST(round(round(
             |      ln(CAST(match_3 AS DOUBLE) / CAST(total_3 AS DOUBLE)),
             |      4) * 10000) AS BIGINT) END AS ln_3,
             |    CASE WHEN match_4 = 0 THEN 0 ELSE CAST(round(round(
             |      ln(CAST(match_4 AS DOUBLE) / CAST(total_4 AS DOUBLE)),
             |      4) * 10000) AS BIGINT) END AS ln_4
             |  FROM wide, lens),
             |fin AS (
             |  SELECT *,
             |    (ln_1 + ln_2 + ln_3 + ln_4 + 800000) // 4 - 200000
             |      AS lbar,
             |    CASE WHEN c_len >= r_len THEN 1.0
             |         ELSE exp(1.0 - CAST(r_len AS DOUBLE)
             |                       / CAST(c_len AS DOUBLE)) END AS bp
             |  FROM lns)
             |SELECT match_1, total_1, match_2, total_2, match_3, total_3,
             |  match_4, total_4, r_len, c_len,
             |  CAST(round(round(bp, 4) * 10000) AS BIGINT) AS bp_micro,
             |  CASE WHEN match_1 = 0 OR match_2 = 0 OR match_3 = 0
             |            OR match_4 = 0 THEN 0
             |       ELSE CAST(round(round(
             |         bp * exp(CAST(lbar AS DOUBLE) / 10000.0),
             |         4) * 10000) AS BIGINT) END AS bleu_micro
             |FROM fin""".stripMargin)),

    // Jaro-Winkler candidate verification — the record-linkage standard
    // metric (Winkler 1990) over the sorted-neighborhood candidates,
    // via the native codegen'd expression (SQL: jaro_winkler),
    // calibrated byte-for-byte against DuckDB's implementation (integer
    // transposition halving, 0.7 boost bar, prefix cap 4). Twins (one
    // trailing-char flip on a 17-char name) score ~0.97 and match at
    // the published 0.85 bar; md5-spread non-twin neighbours fall well
    // below. Full replay: DuckDB recomputes the fixture, the rank
    // window, and its own jaro_winkler_similarity.
    QueryDef(
      "q_linkage_jw",
      (s, dir) => {
        val ents = entityFixture(load(s, dir, "customer"))
        val cands = Linkage.sortedNeighborhoodPairs(ents, "ent_id",
          "name", window = 3, maxDist = Int.MaxValue)
        val named = cands
          .join(ents.select(col("ent_id").as("id_a"),
            col("name").as("name_a")), "id_a")
          .join(ents.select(col("ent_id").as("id_b"),
            col("name").as("name_b")), "id_b")
        named.select(col("id_a"), col("id_b"),
            round(round(graft.functions.TextExpressions
              .jaroWinkler(col("name_a"), col("name_b")), 4) * 10000)
              .cast("long").as("jw_micro"))
          .withColumn("matched", col("jw_micro") >= 8500)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT c_custkey AS ent_id,
             |    c_mktsegment || '-' ||
             |      substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS name
             |  FROM customer WHERE c_custkey < 300),
             |twin AS (
             |  SELECT ent_id + 100000 AS ent_id,
             |    substr(name, 1, len(name) - 1) || 'x' AS name
             |  FROM base WHERE ent_id % 5 = 0),
             |ents AS (
             |  SELECT * FROM base UNION ALL SELECT * FROM twin),
             |rk AS (
             |  SELECT ent_id, name,
             |    row_number() OVER (ORDER BY name, ent_id) - 1 AS r
             |  FROM ents),
             |p AS (
             |  SELECT a.ent_id AS id_a, b.ent_id AS id_b,
             |    CAST(round(round(
             |      jaro_winkler_similarity(a.name, b.name), 4) * 10000)
             |      AS BIGINT) AS jw_micro
             |  FROM rk a JOIN rk b ON b.r > a.r AND b.r <= a.r + 2)
             |SELECT id_a, id_b, jw_micro, jw_micro >= 8500 AS matched
             |FROM p ORDER BY id_a, id_b""".stripMargin)),

    // Corpus chrF2 (Popović 2015): character n-gram F-score, n = 1..6,
    // β = 2, whitespace removed — the MT metric robust to tokenization.
    // One row per n plus the pooled mean; same fingerprint-keyed
    // exchange discipline as BLEU. Full replay.
    QueryDef(
      "q_eval_chrf",
      (s, dir) => {
        val pairs = load(s, dir, "documents").filter(col("doc_id") < 120)
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)"), " ").as("cand"))
        EvalMetrics.corpusChrF(pairs, maxN = 6).orderBy(col("n"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS pid,
             |    regexp_replace(text, '\s', '', 'g') AS rs,
             |    regexp_replace(array_to_string(list_filter(
             |      list_filter(string_split(text, ' '), t -> t <> ''),
             |      (x, i) -> i % 7 != 0), ''), '\s', '', 'g') AS cs
             |  FROM documents WHERE doc_id < 120),
             |ns AS (SELECT n FROM (VALUES (1), (2), (3), (4), (5), (6))
             |       v(n)),
             |cg AS (
             |  SELECT pid, n,
             |    CAST('0x' || substr(md5(substr(cs, CAST(s.i AS INT), n)),
             |      1, 15) AS BIGINT) AS gh
             |  FROM p, ns,
             |       unnest(range(1, greatest(len(cs) - n + 1, 0) + 1))
             |         AS s(i)),
             |rg AS (
             |  SELECT pid, n,
             |    CAST('0x' || substr(md5(substr(rs, CAST(s.i AS INT), n)),
             |      1, 15) AS BIGINT) AS gh
             |  FROM p, ns,
             |       unnest(range(1, greatest(len(rs) - n + 1, 0) + 1))
             |         AS s(i)),
             |cc AS (SELECT pid, n, gh, count(*) AS ccnt
             |       FROM cg GROUP BY pid, n, gh),
             |rc AS (SELECT pid, n, gh, count(*) AS rcnt
             |       FROM rg GROUP BY pid, n, gh),
             |pn AS (
             |  SELECT n,
             |    CAST(sum(least(coalesce(ccnt, 0), coalesce(rcnt, 0)))
             |      AS BIGINT) AS match_n,
             |    CAST(sum(coalesce(ccnt, 0)) AS BIGINT) AS cand_total,
             |    CAST(sum(coalesce(rcnt, 0)) AS BIGINT) AS ref_total
             |  FROM cc FULL JOIN rc USING (pid, n, gh) GROUP BY n),
             |f AS (
             |  SELECT n, match_n, cand_total, ref_total,
             |    CASE WHEN cand_total = 0 THEN 0
             |         ELSE match_n * 1000000 // cand_total END AS p_micro,
             |    CASE WHEN ref_total = 0 THEN 0
             |         ELSE match_n * 1000000 // ref_total END AS r_micro
             |  FROM pn),
             |ff AS (
             |  SELECT *,
             |    CASE WHEN 4 * p_micro + r_micro = 0 THEN 0
             |         ELSE 5 * p_micro * r_micro
             |              // (4 * p_micro + r_micro) END AS f_micro
             |  FROM f),
             |m AS (SELECT CAST(sum(f_micro) AS BIGINT) // 6
             |        AS chrf_micro FROM ff)
             |SELECT n, match_n, cand_total, ref_total, p_micro, r_micro,
             |  f_micro, chrf_micro
             |FROM ff, m ORDER BY n""".stripMargin)),

    // Per-pair token F1 (the SQuAD answer metric, Rajpurkar et al. 2016):
    // clipped unigram overlap → precision/recall/F1 in exact micro-units.
    // Candidates drop every 7th reference token AND re-append the first
    // three (so precision < 1: the extra copies clip at the reference
    // multiplicity). The oracle replays the multiset intersection and all
    // three floor divisions.
    QueryDef(
      "q_eval_token_f1",
      (s, dir) => {
        val pairs = load(s, dir, "documents").filter(col("doc_id") < 120)
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "concat(filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)," +
                " slice(filter(split(text, ' '), t -> t != ''), 1, 3))"),
              " ").as("cand"))
        EvalMetrics.tokenF1(pairs).orderBy(col("pair_id"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS pid,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS rt
             |  FROM documents WHERE doc_id < 120),
             |t AS (
             |  SELECT pid, rt,
             |    list_concat(list_filter(rt, (x, i) -> i % 7 != 0),
             |                rt[1:3]) AS ct
             |  FROM p),
             |cc AS (SELECT pid, g.g AS g, count(*) AS ccnt
             |       FROM t, unnest(ct) AS g(g) GROUP BY pid, g.g),
             |rc AS (SELECT pid, g.g AS g, count(*) AS rcnt
             |       FROM t, unnest(rt) AS g(g) GROUP BY pid, g.g),
             |ov AS (
             |  SELECT pid, CAST(sum(least(ccnt, rcnt)) AS BIGINT) AS overlap
             |  FROM cc JOIN rc USING (pid, g) GROUP BY pid),
             |base AS (
             |  SELECT t.pid AS pair_id, coalesce(overlap, 0) AS overlap,
             |    CAST(len(rt) AS BIGINT) AS r_len,
             |    CAST(len(ct) AS BIGINT) AS c_len
             |  FROM t LEFT JOIN ov ON t.pid = ov.pid),
             |m AS (
             |  SELECT pair_id, overlap, r_len, c_len,
             |    CASE WHEN c_len = 0 THEN 0
             |         ELSE overlap * 1000000 // c_len END AS p_micro,
             |    CASE WHEN r_len = 0 THEN 0
             |         ELSE overlap * 1000000 // r_len END AS r_micro
             |  FROM base)
             |SELECT pair_id, overlap, r_len, c_len, p_micro, r_micro,
             |  CASE WHEN p_micro + r_micro = 0 THEN 0
             |       ELSE 2 * p_micro * r_micro // (p_micro + r_micro)
             |  END AS f1_micro
             |FROM m ORDER BY pair_id""".stripMargin)),

    // Corpus ROUGE-1/2 (Lin 2004): the RECALL complement of BLEU — how
    // much of the reference the candidate recovers, pooled over the
    // corpus, one row per n. Same clipped counts as q_eval_bleu with the
    // denominator swapped to the reference side.
    QueryDef(
      "q_eval_rouge",
      (s, dir) => {
        val pairs = load(s, dir, "documents").filter(col("doc_id") < 120)
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)"), " ").as("cand"))
        EvalMetrics.corpusRougeN(pairs, maxN = 2).orderBy(col("n"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS pid,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS rt
             |  FROM documents WHERE doc_id < 120),
             |t AS (
             |  SELECT pid, rt,
             |    list_filter(rt, (x, i) -> i % 7 != 0) AS ct FROM p),
             |rg AS (
             |  SELECT pid, n.n AS n,
             |         CAST('0x' || substr(md5(
             |           array_to_string(rt[s.i : s.i + n.n - 1], ' ')),
             |           1, 15) AS BIGINT) AS gh
             |  FROM t, (VALUES (1), (2)) n(n),
             |       unnest(range(1, greatest(len(rt) - n.n + 1, 0) + 1))
             |         AS s(i)),
             |cg AS (
             |  SELECT pid, n.n AS n,
             |         CAST('0x' || substr(md5(
             |           array_to_string(ct[s.i : s.i + n.n - 1], ' ')),
             |           1, 15) AS BIGINT) AS gh
             |  FROM t, (VALUES (1), (2)) n(n),
             |       unnest(range(1, greatest(len(ct) - n.n + 1, 0) + 1))
             |         AS s(i)),
             |rc AS (SELECT pid, n, gh, count(*) AS rcnt
             |       FROM rg GROUP BY pid, n, gh),
             |cc AS (SELECT pid, n, gh, count(*) AS ccnt
             |       FROM cg GROUP BY pid, n, gh),
             |pn AS (
             |  SELECT n,
             |    CAST(sum(least(rcnt, coalesce(ccnt, 0))) AS BIGINT)
             |      AS match_n,
             |    CAST(sum(rcnt) AS BIGINT) AS ref_total
             |  FROM rc LEFT JOIN cc USING (pid, n, gh) GROUP BY n)
             |SELECT n, match_n, ref_total,
             |  CASE WHEN ref_total = 0 THEN 0
             |       ELSE match_n * 1000000 // ref_total END AS recall_micro
             |FROM pn ORDER BY n""".stripMargin)),

    // Per-pair ROUGE-L (Lin 2004) through the native codegen'd LCS
    // expression: in-order alignment the n-gram metrics can't see. The
    // oracle is closed-form by construction — the derived candidates are
    // SUBSEQUENCES of their references (every 7th token dropped), so
    // LCS = c_len exactly; three planted scrambled/disjoint pairs carry
    // hand-computed LCS values (3, 3, 0) that exercise the general DP,
    // and the spec pins more. Both sides then replay the same micro-unit
    // P/R/F arithmetic.
    QueryDef(
      "q_eval_rouge_l",
      (s, dir) => {
        import s.implicits._
        val derived = load(s, dir, "documents").filter(col("doc_id") < 120)
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)"), " ").as("cand"))
        val planted = Seq(
          (900001L, "a b c d e", "b a d c e"), // LCS 3
          (900002L, "x y x y", "y x y x"),     // LCS 3
          (900003L, "p q r", "s t"))           // LCS 0
          .toDF("pair_id", "ref", "cand")
        EvalMetrics.rougeL(derived.unionByName(planted))
          .orderBy(col("pair_id"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS pid,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS rt
             |  FROM documents WHERE doc_id < 120),
             |d AS (
             |  SELECT pid AS pair_id,
             |    CAST(len(rt) AS BIGINT) AS r_len,
             |    CAST(len(list_filter(rt, (x, i) -> i % 7 != 0))
             |      AS BIGINT) AS c_len,
             |    -- cand is a subsequence of ref: LCS = |cand| exactly
             |    CAST(len(list_filter(rt, (x, i) -> i % 7 != 0))
             |      AS BIGINT) AS lcs
             |  FROM p
             |  UNION ALL
             |  SELECT * FROM (VALUES
             |    (900001, CAST(5 AS BIGINT), CAST(5 AS BIGINT),
             |     CAST(3 AS BIGINT)),
             |    (900002, 4, 4, 3),
             |    (900003, 3, 2, 0)) v(pair_id, r_len, c_len, lcs)),
             |m AS (
             |  SELECT pair_id, lcs, r_len, c_len,
             |    CASE WHEN r_len = 0 THEN 0
             |         ELSE lcs * 1000000 // r_len END AS r_micro,
             |    CASE WHEN c_len = 0 THEN 0
             |         ELSE lcs * 1000000 // c_len END AS p_micro
             |  FROM d)
             |SELECT pair_id, lcs, r_len, c_len, r_micro, p_micro,
             |  CASE WHEN p_micro + r_micro = 0 THEN 0
             |       ELSE 2 * p_micro * r_micro // (p_micro + r_micro)
             |  END AS f_micro
             |FROM m ORDER BY pair_id""".stripMargin)),

    // Luhn-validated card detection (Luhn 1960) — the checksum gate
    // behind the PII digit-run regex: the fixture plants one 16-digit
    // candidate per customer (custkey < 200) whose check digit is
    // CORRECT for even keys and corrupted (+5 mod 10) for odd keys, so
    // both verdicts appear and the expected outcome is known by
    // construction. The oracle rebuilds the fixture and replays the
    // mod-10 checksum digit by digit over the extracted candidate.
    QueryDef(
      "q_pii_luhn",
      (s, dir) => {
        val fx = load(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_custkey").as("doc_id"),
            expr("concat('4', lpad(cast(c_custkey as string), 14, '0'))")
              .as("prefix"))
          .withColumn("s", expr(
            """aggregate(sequence(1, 15), 0,
              |  (acc, i) -> acc + (CASE WHEN i % 2 = 1
              |    THEN IF(2 * CAST(substring(prefix, i, 1) AS INT) > 9,
              |            2 * CAST(substring(prefix, i, 1) AS INT) - 9,
              |            2 * CAST(substring(prefix, i, 1) AS INT))
              |    ELSE CAST(substring(prefix, i, 1) AS INT) END))"""
              .stripMargin))
          .withColumn("digit", expr(
            "CASE WHEN doc_id % 2 = 0 THEN (10 - s % 10) % 10" +
              " ELSE ((10 - s % 10) % 10 + 5) % 10 END"))
          .select(col("doc_id"),
            concat(lit("ref card "), col("prefix"),
              col("digit").cast("string"), lit(" end")).as("text"))
        graft.llm.TextAnalysis.luhnScan(fx)
          .orderBy(col("doc_id"), col("candidate"))
      },
      Some("""WITH fx AS (
             |  SELECT c_custkey AS doc_id,
             |    '4' || lpad(CAST(c_custkey AS VARCHAR), 14, '0') AS prefix
             |  FROM customer WHERE c_custkey < 200),
             |sm AS (
             |  SELECT doc_id, prefix,
             |    list_sum(list_transform(range(1, 16), i ->
             |      CASE WHEN i % 2 = 1
             |        THEN CASE
             |          WHEN 2 * CAST(substr(prefix, CAST(i AS INT), 1)
             |                        AS INT) > 9
             |          THEN 2 * CAST(substr(prefix, CAST(i AS INT), 1)
             |                        AS INT) - 9
             |          ELSE 2 * CAST(substr(prefix, CAST(i AS INT), 1)
             |                        AS INT) END
             |        ELSE CAST(substr(prefix, CAST(i AS INT), 1) AS INT)
             |      END)) AS s
             |  FROM fx),
             |num AS (
             |  SELECT doc_id, prefix || CAST(
             |    CASE WHEN doc_id % 2 = 0 THEN (10 - s % 10) % 10
             |         ELSE ((10 - s % 10) % 10 + 5) % 10 END AS VARCHAR)
             |    AS candidate
             |  FROM sm)
             |SELECT doc_id, candidate,
             |  list_sum(list_transform(range(1, len(candidate) + 1), i ->
             |    CASE WHEN (len(candidate) - i) % 2 = 1
             |      THEN CASE
             |        WHEN 2 * CAST(substr(candidate, CAST(i AS INT), 1)
             |                      AS INT) > 9
             |        THEN 2 * CAST(substr(candidate, CAST(i AS INT), 1)
             |                      AS INT) - 9
             |        ELSE 2 * CAST(substr(candidate, CAST(i AS INT), 1)
             |                      AS INT) END
             |      ELSE CAST(substr(candidate, CAST(i AS INT), 1) AS INT)
             |    END)) % 10 = 0 AS luhn_ok
             |FROM num ORDER BY doc_id, candidate""".stripMargin)),

    // PMI collocations (Church & Hanks, CL 1990): adjacent-token pairs
    // ranked by pointwise mutual information ln(c(x,y)·N / (cx·cy))
    // with bigram-based marginals — the corpus-linguistics collocation
    // detector (and the signal behind phrase-vocab induction). Pairs
    // come from zip_with against the shifted token array (no window
    // over the corpus); counts are exact; one ln → 4 dp micro.
    QueryDef(
      "q_text_pmi",
      (s, dir) => {
        val pairs = load(s, dir, "documents")
          .select(filter(split(col("text"), " "), t => t =!= "").as("ts"))
          .select(explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
            (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
          .filter(col("p.y").isNotNull)
          .select(col("p.x").as("x"), col("p.y").as("y"))
        val cxy = pairs.groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("cxy"))
        val n = cxy.agg(sum(col("cxy")).as("n"))
        val cx = cxy.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
        val cy = cxy.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
        cxy.filter(col("cxy") >= 5)
          .join(cx, "x").join(cy, "y").crossJoin(broadcast(n))
          .withColumn("pmi_micro",
            round(round(log(col("cxy").cast("double")
              * col("n").cast("double")
              / (col("cx").cast("double") * col("cy").cast("double"))),
              4) * 10000).cast("long"))
          .select(col("x"), col("y"), col("cxy"), col("pmi_micro"))
          .orderBy(col("pmi_micro").desc, col("x"), col("y"))
          .limit(50)
      },
      Some("""WITH toks AS (
             |  SELECT list_filter(string_split(text, ' '), t -> t <> '')
             |    AS ts
             |  FROM documents),
             |pr AS (
             |  SELECT ts[CAST(i AS INT)] AS x,
             |         ts[CAST(i AS INT) + 1] AS y
             |  FROM toks, unnest(range(1, greatest(len(ts), 1))) AS s(i)),
             |cxy AS (SELECT x, y, count(*) AS cxy FROM pr GROUP BY x, y),
             |n AS (SELECT CAST(sum(cxy) AS BIGINT) AS n FROM cxy),
             |cx AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS cx
             |       FROM cxy GROUP BY x),
             |cy AS (SELECT y, CAST(sum(cxy) AS BIGINT) AS cy
             |       FROM cxy GROUP BY y)
             |SELECT x, y, cxy,
             |  CAST(round(round(ln(CAST(cxy AS DOUBLE) * CAST(n AS DOUBLE)
             |    / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 4) * 10000)
             |    AS BIGINT) AS pmi_micro
             |FROM cxy JOIN cx USING (x) JOIN cy USING (y), n
             |WHERE cxy >= 5
             |ORDER BY pmi_micro DESC, x, y
             |LIMIT 50""".stripMargin)),

    // Term dispersion DP (Gries 2008): how evenly a term spreads across
    // corpus parts (the `source` column) — 0 = perfectly proportional,
    // →1 = concentrated in one part. A high-frequency term with high DP
    // is a template artifact, not vocabulary; dispersion is the
    // published complement of raw frequency for stopword/boilerplate
    // decisions. DP = ½·Σ_parts |v_i/f − s_i| over ALL parts (zero
    // counts included via the part × term grid), every share an exact
    // floor-division micro-unit.
    QueryDef(
      "q_text_dispersion",
      (s, dir) => {
        val toks = load(s, dir, "documents")
          .select(col("source"),
            explode(filter(split(col("text"), " "), t => t =!= ""))
              .as("t"))
        val vt = toks.groupBy(col("source"), col("t"))
          .agg(count(lit(1)).as("v"))
        val sizes = toks.groupBy(col("source"))
          .agg(count(lit(1)).as("sz"))
        val total = sizes.agg(sum(col("sz")).as("tt"))
        val f = vt.groupBy(col("t")).agg(sum(col("v")).as("f"))
          .filter(col("f") >= 100)
        f.crossJoin(broadcast(sizes)).crossJoin(broadcast(total))
          .join(vt, Seq("source", "t"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L)))
          .withColumn("d", abs(expr("v * 1000000L div f")
            - expr("sz * 1000000L div tt")))
          .groupBy(col("t"), col("f"))
          .agg(expr("sum(d) div 2").as("dp_micro"))
          .orderBy(col("t"))
      },
      Some("""WITH toks AS (
             |  SELECT source, u.t AS t
             |  FROM documents,
             |       unnest(list_filter(string_split(text, ' '),
             |                          x -> x <> '')) AS u(t)),
             |vt AS (SELECT source, t, count(*) AS v
             |       FROM toks GROUP BY source, t),
             |sz AS (SELECT source, count(*) AS sz
             |       FROM toks GROUP BY source),
             |tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM toks),
             |f AS (SELECT t, CAST(sum(v) AS BIGINT) AS f
             |      FROM vt GROUP BY t HAVING sum(v) >= 100),
             |grid AS (
             |  SELECT f.t, f.f, sz.source, sz.sz,
             |    coalesce(vt.v, 0) AS v
             |  FROM f CROSS JOIN sz
             |  LEFT JOIN vt ON vt.source = sz.source AND vt.t = f.t)
             |SELECT t, f,
             |  CAST(sum(abs(v * 1000000 // f
             |               - sz * 1000000 // (SELECT tt FROM tt)))
             |    AS BIGINT) // 2 AS dp_micro
             |FROM grid GROUP BY t, f
             |ORDER BY t""".stripMargin)),

    // Two-sample Kolmogorov-Smirnov statistic per event type (the
    // classic distribution-shift test behind A/B and canary checks):
    // D = max_b |cdfA(b) − cdfB(b)| over 0.01-width value bins, with the
    // deterministic even/odd event_id split as the two samples.
    // The per-bin term and the ARGMAX are integer-exact via
    // cross-multiplication (|cumA·nB − cumB·nA|, pure BIGINT — safe to
    // ~3e9 events per split); only the final statistic is ONE stated-
    // order IEEE expression over those exact integers (diff/nA/nB·1e6,
    // floored) — `diff·1e6` in BIGINT would overflow at ~3e6 events per
    // split, far inside the query's claimed horizon. Both engines
    // replay the same double ops bit for bit.
    // Scale shape: one (type, bin) hash aggregation
    // (linear shuffle); the cumulative/argmax windows run per type over
    // the BOUNDED bin list (value range / 0.01), never the event stream.
    // Production-honest: binned KS is the published streaming/sketch
    // form; the bin width is the resolution knob.
    QueryDef(
      "q_drift_ks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cells = load(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("bin"),
            (col("event_id") % 2 === 0).as("is_a"))
          .groupBy(col("event_type"), col("bin"))
          .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("is_a"), 0L).otherwise(1L)).as("cb"))
        val wCum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("event_type"))
        val wPick = Window.partitionBy(col("event_type"))
          .orderBy(col("diff").desc, col("bin"))
        cells
          .withColumn("cum_a", sum(col("ca")).over(wCum))
          .withColumn("cum_b", sum(col("cb")).over(wCum))
          .withColumn("n_a", sum(col("ca")).over(wAll))
          .withColumn("n_b", sum(col("cb")).over(wAll))
          .withColumn("diff",
            abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .withColumn("ks_micro", expr(
            "CAST(floor(CAST(diff AS DOUBLE) / CAST(n_a AS DOUBLE)" +
              " / CAST(n_b AS DOUBLE) * 1000000.0) AS BIGINT)"))
          .select(col("event_type"), col("n_a"), col("n_b"),
            col("bin").as("at_bin"), col("ks_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100) AS BIGINT) AS bin,
             |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END)
             |      AS BIGINT) AS cb
             |  FROM events GROUP BY event_type, bin),
             |c AS (
             |  SELECT event_type, bin,
             |    CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
             |    CAST(sum(cb) OVER w AS BIGINT) AS cum_b,
             |    CAST(sum(ca) OVER t AS BIGINT) AS n_a,
             |    CAST(sum(cb) OVER t AS BIGINT) AS n_b
             |  FROM cells
             |  WINDOW w AS (PARTITION BY event_type ORDER BY bin
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  t AS (PARTITION BY event_type)),
             |d AS (
             |  SELECT event_type, bin, n_a, n_b,
             |    abs(cum_a * n_b - cum_b * n_a) AS diff,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY abs(cum_a * n_b - cum_b * n_a) DESC, bin)
             |      AS rn
             |  FROM c)
             |SELECT event_type, n_a, n_b, bin AS at_bin,
             |  CAST(floor(CAST(diff AS DOUBLE) / CAST(n_a AS DOUBLE)
             |    / CAST(n_b AS DOUBLE) * 1000000.0) AS BIGINT)
             |    AS ks_micro
             |FROM d WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    // rung above l-diversity on the SAME equivalence classes: each
    // class's acctbal-band distribution must sit within EMD t of the
    // table's. Ordered-attribute EMD in the published closed form
    // (mean |cdf gap|), integer-exact via cross-multiplication (see
    // Privacy.tCloseness); t = 0.25.
    QueryDef(
      "q_privacy_tcloseness",
      (s, dir) => Privacy.tCloseness(load(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long"), tMicro = 250000L)
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
      Some("""WITH cells AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
             |    count(*) AS cnt
             |  FROM customer GROUP BY c_nationkey, c_mktsegment, bucket),
             |buckets AS (
             |  SELECT bucket, CAST(sum(cnt) AS BIGINT) AS gcnt
             |  FROM cells GROUP BY bucket),
             |classes AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(sum(cnt) AS BIGINT) AS class_size
             |  FROM cells GROUP BY c_nationkey, c_mktsegment),
             |grid AS (
             |  SELECT cl.c_nationkey, cl.c_mktsegment, cl.class_size,
             |    b.bucket, b.gcnt, coalesce(ce.cnt, 0) AS cnt
             |  FROM classes cl CROSS JOIN buckets b
             |  LEFT JOIN cells ce
             |    ON ce.c_nationkey = cl.c_nationkey
             |    AND ce.c_mktsegment = cl.c_mktsegment
             |    AND ce.bucket = b.bucket),
             |t AS (
             |  SELECT c_nationkey, c_mktsegment, class_size,
             |    CAST(sum(cnt) OVER w AS BIGINT) AS cum_c,
             |    CAST(sum(gcnt) OVER w AS BIGINT) AS cum_g,
             |    CAST(sum(gcnt) OVER p AS BIGINT) AS n_total,
             |    CAST(count(*) OVER p AS BIGINT) AS m
             |  FROM grid
             |  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment
             |    ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  p AS (PARTITION BY c_nationkey, c_mktsegment)),
             |e AS (
             |  SELECT c_nationkey, c_mktsegment, class_size,
             |    CAST(sum(abs(cum_c * n_total - cum_g * class_size))
             |      AS BIGINT) AS emd_num,
             |    max(m) AS m, max(n_total) AS n_total
             |  FROM t
             |  GROUP BY c_nationkey, c_mktsegment, class_size)
             |SELECT c_nationkey, c_mktsegment, class_size,
             |  CAST(floor(CAST(emd_num AS DOUBLE)
             |    / CAST(greatest(m - 1, 1) AS DOUBLE)
             |    / CAST(class_size AS DOUBLE) / CAST(n_total AS DOUBLE)
             |    * 1000000.0) AS BIGINT) AS emd_micro,
             |  CAST(floor(CAST(emd_num AS DOUBLE)
             |    / CAST(greatest(m - 1, 1) AS DOUBLE)
             |    / CAST(class_size AS DOUBLE) / CAST(n_total AS DOUBLE)
             |    * 1000000.0) AS BIGINT) <= 250000 AS t_close
             |FROM e ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // Population stability index (the credit-scoring drift standard;
    // PSI > 0.2 is the published "significant shift" bar) between two
    // crawl sources' document-length distributions: 50-char bins,
    // Laplace +1 smoothing so empty bins stay defined, contributions
    // (p−q)·ln(p/q) — sign-aligned factors, so every term and the sum
    // are non-negative exact micro-units after the one IEEE ln.
    QueryDef(
      "q_drift_psi",
      (s, dir) => {
        val docs = load(s, dir, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"), expr("n_chars div 50").as("bin"))
        val bins = docs.select(col("bin")).distinct()
        def cnt(src: String, out: String) =
          docs.filter(col("source") === src)
            .groupBy(col("bin")).agg(count(lit(1)).as(out))
        val joined = bins
          .join(cnt("src0", "cp"), Seq("bin"), "left")
          .join(cnt("src1", "cq"), Seq("bin"), "left")
          .select(col("bin"),
            (coalesce(col("cp"), lit(0L)) + 1).as("cp"),
            (coalesce(col("cq"), lit(0L)) + 1).as("cq"))
        val totals = joined.agg(sum(col("cp")).as("np"),
          sum(col("cq")).as("nq"))
        joined.crossJoin(broadcast(totals))
          .withColumn("p_micro", expr("cp * 1000000L div np"))
          .withColumn("q_micro", expr("cq * 1000000L div nq"))
          .withColumn("ln_micro",
            round(round(log(col("p_micro").cast("double")
              / col("q_micro").cast("double")), 4) * 10000).cast("long"))
          .withColumn("psi_bin_micro",
            expr("(p_micro - q_micro) * ln_micro div 10000"))
          .select(col("bin"), col("cp"), col("cq"), col("p_micro"),
            col("q_micro"), col("psi_bin_micro"))
          .orderBy(col("bin"))
      },
      Some("""WITH d AS (
             |  SELECT source, n_chars // 50 AS bin FROM documents
             |  WHERE source IN ('src0', 'src1')),
             |bins AS (SELECT DISTINCT bin FROM d),
             |cp AS (SELECT bin, count(*) AS c FROM d
             |       WHERE source = 'src0' GROUP BY bin),
             |cq AS (SELECT bin, count(*) AS c FROM d
             |       WHERE source = 'src1' GROUP BY bin),
             |j AS (
             |  SELECT bin, coalesce(cp.c, 0) + 1 AS cp,
             |         coalesce(cq.c, 0) + 1 AS cq
             |  FROM bins LEFT JOIN cp USING (bin)
             |            LEFT JOIN cq USING (bin)),
             |t AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
             |             CAST(sum(cq) AS BIGINT) AS nq FROM j),
             |m AS (
             |  SELECT bin, cp, cq,
             |    cp * 1000000 // np AS p_micro,
             |    cq * 1000000 // nq AS q_micro
             |  FROM j, t)
             |SELECT bin, cp, cq, p_micro, q_micro,
             |  (p_micro - q_micro) * CAST(round(round(
             |     ln(CAST(p_micro AS DOUBLE) / CAST(q_micro AS DOUBLE)),
             |     4) * 10000) AS BIGINT) // 10000 AS psi_bin_micro
             |FROM m ORDER BY bin""".stripMargin)),

    // TextRank keywords (Mihalcea & Tarau, EMNLP 2004): PageRank over
    // the word co-occurrence graph (adjacency window 2, undirected) —
    // the unsupervised keyword extractor. Words become 60-bit
    // fingerprint node ids; the sweep is the exact-integer
    // Graphs.pagerankExact (4 sweeps, 0.85); the oracle rebuilds the
    // graph and replays the SAME unrolled CTE chain every pagerank
    // query shares, then joins ranks back to words.
    QueryDef(
      "q_text_textrank",
      (s, dir) => {
        val fpOf = (g: org.apache.spark.sql.Column) =>
          conv(substring(md5(g), 1, 15), 16, 10).cast("long")
        val prs = load(s, dir, "documents")
          .select(filter(split(col("text"), " "), t => t =!= "").as("ts"))
          .select(explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
            (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
          .filter(col("p.y").isNotNull && col("p.x") =!= col("p.y"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
        val edges = prs
          .unionByName(prs.select(col("y").as("x"), col("x").as("y")))
          .select(fpOf(col("x")).as("src"), fpOf(col("y")).as("dst"))
          .distinct()
        val words = prs.select(col("x").as("word"))
          .unionByName(prs.select(col("y").as("word"))).distinct()
          .select(col("word"), fpOf(col("word")).as("node"))
        graft.llm.Graphs.pagerankExact(edges, iters = 4)
          .join(words, "node")
          .select(col("word"), col("rank"))
          .orderBy(col("rank").desc, col("word")).limit(100)
      },
      Some {
        val prelude =
          """toks AS (
            |  SELECT list_filter(string_split(text, ' '), t -> t <> '')
            |    AS ts
            |  FROM documents),
            |pr AS (
            |  SELECT ts[CAST(i AS INT)] AS x, ts[CAST(i AS INT) + 1] AS y
            |  FROM toks, unnest(range(1, greatest(len(ts), 1))) AS s(i)
            |  WHERE ts[CAST(i AS INT)] <> ts[CAST(i AS INT) + 1]),
            |und AS (
            |  SELECT x, y FROM pr UNION ALL SELECT y, x FROM pr),
            |wmap AS (
            |  SELECT DISTINCT x AS word,
            |    CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) AS fp
            |  FROM und)""".stripMargin
        val chain = LlmQueries.pagerankCtesSql(
          edgesSql = """SELECT DISTINCT
                       |    CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
                       |      AS src,
                       |    CAST('0x' || substr(md5(y), 1, 15) AS BIGINT)
                       |      AS dst
                       |  FROM und""".stripMargin,
          iters = 4)
        s"""WITH $prelude,
           |$chain
           |SELECT w.word AS word, r.rank AS rank
           |FROM r4 r JOIN wmap w ON w.fp = r.node
           |ORDER BY rank DESC, word LIMIT 100""".stripMargin
      }),

    // distinct-n diversity (Li et al., NAACL 2016): distinct n-grams /
    // total n-grams over the candidate side — the standard degenerate-
    // repetition detector for generated text (a looping generator
    // scores near 0). Distinctness counts over the 60-bit fingerprints
    // (the fixed-width-key rule); one row per n = 1, 2.
    QueryDef(
      "q_eval_distinct_n",
      (s, dir) => {
        val cands = load(s, dir, "documents").filter(col("doc_id") < 120)
          .select(expr("filter(filter(split(text, ' '), t -> t != '')," +
            " (t, i) -> (i + 1) % 7 != 0)").as("ct"))
        val grams = (1 to 2).map { n =>
          cands.select(lit(n).as("n"), explode(
            when(size(col("ct")) >= n,
              transform(sequence(lit(1), size(col("ct")) - (n - 1)),
                i => array_join(slice(col("ct"), i, lit(n)), " ")))
              .otherwise(array().cast("array<string>"))).as("g"))
        }.reduce(_ unionByName _)
        grams
          .select(col("n"),
            conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
              .as("gh"))
          .groupBy(col("n"))
          .agg(countDistinct(col("gh")).as("n_distinct"),
            count(lit(1)).as("n_total"))
          .withColumn("distinct_micro",
            expr("n_distinct * 1000000L div n_total"))
          .orderBy(col("n"))
      },
      Some("""WITH p AS (
             |  SELECT list_filter(
             |    list_filter(string_split(text, ' '), t -> t <> ''),
             |    (x, i) -> i % 7 != 0) AS ct
             |  FROM documents WHERE doc_id < 120),
             |g AS (
             |  SELECT n.n AS n,
             |    CAST('0x' || substr(md5(
             |      array_to_string(ct[s.i : s.i + n.n - 1], ' ')), 1, 15)
             |      AS BIGINT) AS gh
             |  FROM p, (VALUES (1), (2)) n(n),
             |       unnest(range(1, greatest(len(ct) - n.n + 1, 0) + 1))
             |         AS s(i))
             |SELECT n, CAST(count(DISTINCT gh) AS BIGINT) AS n_distinct,
             |  count(*) AS n_total,
             |  count(DISTINCT gh) * 1000000 // count(*) AS distinct_micro
             |FROM g GROUP BY n ORDER BY n""".stripMargin)),

    // Lexical diversity per document: type-token ratio (types·1e6 div
    // tokens) and Guiraud's root TTR types/√tokens (Guiraud 1954 — the
    // length-corrected variant, since raw TTR decays with length) —
    // the per-doc vocabulary-richness signals beside the corpus-level
    // Heaps/Zipf laws. One IEEE sqrt under the 4-dp micro discipline.
    QueryDef(
      "q_text_ttr",
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(split(col("text"), " "), t => t =!= ""))
            .cast("long").as("tokens"),
          size(array_distinct(filter(split(col("text"), " "),
            t => t =!= ""))).cast("long").as("types"))
        .filter(col("tokens") > 0)
        .withColumn("ttr_micro", expr("types * 1000000L div tokens"))
        .withColumn("guiraud_micro",
          round(round(col("types").cast("double")
            / sqrt(col("tokens").cast("double")), 4) * 10000)
            .cast("long"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      x -> x <> '')) AS BIGINT) AS tokens,
             |    CAST(len(list_distinct(list_filter(
             |      string_split(text, ' '), x -> x <> ''))) AS BIGINT)
             |      AS types
             |  FROM documents)
             |SELECT doc_id, tokens, types,
             |  types * 1000000 // tokens AS ttr_micro,
             |  CAST(round(round(CAST(types AS DOUBLE)
             |    / sqrt(CAST(tokens AS DOUBLE)), 4) * 10000) AS BIGINT)
             |    AS guiraud_micro
             |FROM t WHERE tokens > 0 ORDER BY doc_id""".stripMargin)),

    // RAKE keyphrases (Rose et al. 2010): candidate phrases are maximal
    // stopword-free token runs; each word scores deg/freq where deg =
    // freq + Σ per occurrence (phrase_len − 1) (the rake-nltk co-
    // occurrence rule); a phrase scores the sum over its tokens (with
    // multiplicity). Stopwords here are the corpus's fillers {a, the}.
    // Phrase splitting rides the CDC span machinery under the direct-
    // argument lambda discipline; scores are exact floor-division
    // micro-units; top-20 by (score, phrase) is deterministic.
    QueryDef(
      "q_text_rake",
      (s, dir) => {
        val ts = filter(split(col("text"), " "), t => t =!= "")
        val phrases = load(s, dir, "documents")
          .select(col("doc_id"), ts.as("ts"))
          .withColumn("cs", filter(
            zip_with(col("ts"),
              sequence(lit(1), greatest(size(col("ts")), lit(1))),
              (t, i) => when(t === "a" || t === "the", i)
                .otherwise(lit(-1))),
            x => x =!= -1))
          .withColumn("starts",
            concat(array(lit(1)), transform(col("cs"), c => c + 1)))
          .withColumn("ends",
            concat(transform(col("cs"), c => c - 1),
              array(size(col("ts")))))
          .select(col("doc_id"), col("ts"),
            explode(zip_with(col("starts"), col("ends"),
              (a, b) => struct(a.as("s"), b.as("e")))).as("se"))
          .filter(col("se.e") >= col("se.s"))
          .select(array_join(slice(col("ts"), col("se.s"),
            col("se.e") - col("se.s") + 1), " ").as("phrase"),
            (col("se.e") - col("se.s") + 1).cast("long").as("plen"))
        // three consumers (word scores, phrase-token join, occurrence
        // counts): persist or the span assembly re-runs per consumer
        val ph = phrases
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val words = ph.select(col("plen"),
          explode(split(col("phrase"), " ")).as("w"))
        val scores = words.groupBy(col("w"))
          .agg(count(lit(1)).as("freq"),
            (count(lit(1)) + sum(col("plen") - 1)).as("deg"))
          .withColumn("score_micro", expr("deg * 1000000L div freq"))
        // sum over ALL occurrences' tokens = per-occurrence score ×
        // n_occur (every occurrence contributes the same integer), so
        // the later div n_occur is exact
        ph.select(col("phrase"),
            explode(split(col("phrase"), " ")).as("w"))
          .join(scores, "w")
          .groupBy(col("phrase"))
          .agg(sum(col("score_micro")).as("sum_all"))
          .join(ph.groupBy(col("phrase"))
            .agg(count(lit(1)).as("n_occur"), min(col("plen")).as("plen")),
            "phrase")
          .withColumn("score_micro",
            expr("sum_all div n_occur"))
          .select(col("phrase"), col("plen"), col("n_occur"),
            col("score_micro"))
          .orderBy(col("score_micro").desc, col("phrase"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS ts
             |  FROM documents),
             |cuts AS (
             |  SELECT doc_id, ts,
             |    list_filter(range(1, len(ts) + 1),
             |      i -> ts[CAST(i AS INT)] IN ('a', 'the')) AS cs
             |  FROM toks),
             |spans AS (
             |  SELECT doc_id, ts,
             |    list_prepend(CAST(1 AS BIGINT),
             |      list_transform(cs, c -> c + 1)) AS starts,
             |    list_append(list_transform(cs, c -> c - 1),
             |      CAST(len(ts) AS BIGINT)) AS ends
             |  FROM cuts),
             |ph AS (
             |  SELECT array_to_string(ts[starts[u.i] : ends[u.i]], ' ')
             |    AS phrase,
             |    CAST(ends[u.i] - starts[u.i] + 1 AS BIGINT) AS plen
             |  FROM spans, unnest(range(1, len(starts) + 1)) AS u(i)
             |  WHERE ends[u.i] >= starts[u.i]),
             |wd AS (
             |  SELECT w.w AS w, plen
             |  FROM ph, unnest(string_split(phrase, ' ')) AS w(w)),
             |sc AS (
             |  SELECT w, count(*) AS freq,
             |    CAST(count(*) + sum(plen - 1) AS BIGINT) AS deg,
             |    (count(*) + CAST(sum(plen - 1) AS BIGINT)) * 1000000
             |      // count(*) AS score_micro
             |  FROM wd GROUP BY w),
             |pw AS (
             |  SELECT phrase, w.w AS w
             |  FROM ph, unnest(string_split(phrase, ' ')) AS w(w)),
             |psum AS (
             |  SELECT phrase, CAST(sum(score_micro) AS BIGINT) AS sum_all
             |  FROM pw JOIN sc USING (w) GROUP BY phrase),
             |pocc AS (
             |  SELECT phrase, count(*) AS n_occur,
             |    CAST(min(plen) AS BIGINT) AS plen
             |  FROM ph GROUP BY phrase)
             |SELECT phrase, plen, n_occur,
             |  sum_all // n_occur AS score_micro
             |FROM psum JOIN pocc USING (phrase)
             |ORDER BY score_micro DESC, phrase
             |LIMIT 20""".stripMargin)),

    // word2vec negative-sampling table (Mikolov et al., NIPS 2013 §2.2):
    // noise distribution ∝ count^0.75 — the published flattening that
    // keeps rare words sampleable. Per-term weight and cumulative share
    // in micro-units; ONE IEEE pow per term then exact integer
    // normalization; the cumulative window runs over the bounded
    // vocabulary, never the corpus.
    QueryDef(
      "q_token_negsample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = load(s, dir, "documents")
          .select(explode(filter(split(col("text"), " "),
            t => t =!= "")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
          .withColumn("w_micro",
            round(round(pow(col("cnt").cast("double"), 0.75), 4) * 10000)
              .cast("long"))
        val total = counts.agg(sum(col("w_micro")).as("tw"))
        counts.crossJoin(broadcast(total))
          .withColumn("p_micro", expr("w_micro * 1000000L div tw"))
          .withColumn("cum_micro",
            sum(col("p_micro")).over(
              Window.orderBy(col("cnt").desc, col("t"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("t"), col("cnt"), col("w_micro"), col("p_micro"),
            col("cum_micro"))
          .orderBy(col("cnt").desc, col("t"))
      },
      Some("""WITH tk AS (
             |  SELECT u.t AS t
             |  FROM documents,
             |       unnest(list_filter(string_split(text, ' '),
             |                          x -> x <> '')) AS u(t)),
             |c AS (
             |  SELECT t, count(*) AS cnt,
             |    CAST(round(round(pow(CAST(count(*) AS DOUBLE), 0.75), 4)
             |      * 10000) AS BIGINT) AS w_micro
             |  FROM tk GROUP BY t),
             |tw AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tw FROM c),
             |p AS (
             |  SELECT t, cnt, w_micro,
             |    w_micro * 1000000 // (SELECT tw FROM tw) AS p_micro
             |  FROM c)
             |SELECT t, cnt, w_micro, p_micro,
             |  CAST(sum(p_micro) OVER (ORDER BY cnt DESC, t
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_micro
             |FROM p ORDER BY cnt DESC, t""".stripMargin)),

    // word2vec frequent-word subsampling (Mikolov et al. 2013 §2.3):
    // p_discard = 1 − sqrt(t/f) with t = 1e-3 against each term's
    // corpus frequency share — the aggressive downweighting of
    // stopword-frequency terms that speeds training and IMPROVES rare
    // vectors. Frequency shares and the final probability in exact
    // micro-units around the one IEEE sqrt; never negative (terms
    // below the threshold keep p_discard = 0).
    QueryDef(
      "q_token_subsample",
      (s, dir) => {
        val counts = load(s, dir, "documents")
          .select(explode(filter(split(col("text"), " "),
            t => t =!= "")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
        val total = counts.agg(sum(col("cnt")).as("n"))
        counts.crossJoin(broadcast(total))
          .withColumn("f_micro", expr("cnt * 1000000L div n"))
          // f_micro floors to 0 for rare terms once the corpus passes
          // ~1e6 tokens; sqrt(t/0)=Inf would Long.MaxValue-overflow in
          // Spark and crash the DuckDB cast — such terms are below the
          // threshold, so p_discard is exactly 0.
          .withColumn("p_discard_micro",
            when(col("f_micro") === 0L, lit(0L)).otherwise(
              greatest(lit(0L),
                lit(1000000L) - round(round(
                  sqrt(lit(1000.0) / col("f_micro").cast("double")), 4)
                  * 10000).cast("long") * 100)))
          .select(col("t"), col("cnt"), col("f_micro"),
            col("p_discard_micro"))
          .orderBy(col("cnt").desc, col("t"))
      },
      Some("""WITH tk AS (
             |  SELECT u.t AS t
             |  FROM documents,
             |       unnest(list_filter(string_split(text, ' '),
             |                          x -> x <> '')) AS u(t)),
             |c AS (SELECT t, count(*) AS cnt FROM tk GROUP BY t),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
             |f AS (SELECT t, cnt,
             |        cnt * 1000000 // (SELECT n FROM n) AS f_micro
             |      FROM c)
             |SELECT t, cnt, f_micro,
             |  CASE WHEN f_micro = 0 THEN CAST(0 AS BIGINT)
             |       ELSE greatest(CAST(0 AS BIGINT), 1000000 -
             |         CAST(round(round(sqrt(1000.0 /
             |           CAST(f_micro AS DOUBLE)),
             |           4) * 10000) AS BIGINT) * 100)
             |  END AS p_discard_micro
             |FROM f ORDER BY cnt DESC, t""".stripMargin)),

    // Jensen-Shannon divergence (Lin 1991) between the same two source
    // distributions PSI audits — the SYMMETRIC, [0, ln 2]-bounded
    // complement (PSI blows up on near-empty bins; JSD never does).
    // Same bins and Laplace smoothing as q_drift_psi; per-bin rows carry
    // the raw integer products p·ln(p/m) + q·ln(q/m) WITHOUT division
    // (they are signed, and trunc-vs-floor division diverges below
    // zero); the one final division happens after the non-negative
    // clamp of the total (JSD >= 0 exactly; the 4-dp ln rounding can
    // push the integer sum epsilon-negative).
    QueryDef(
      "q_drift_jsd",
      (s, dir) => {
        val docs = load(s, dir, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"), expr("n_chars div 50").as("bin"))
        val bins = docs.select(col("bin")).distinct()
        def cnt(src: String, out: String) =
          docs.filter(col("source") === src)
            .groupBy(col("bin")).agg(count(lit(1)).as(out))
        val joined = bins
          .join(cnt("src0", "cp"), Seq("bin"), "left")
          .join(cnt("src1", "cq"), Seq("bin"), "left")
          .select(col("bin"),
            (coalesce(col("cp"), lit(0L)) + 1).as("cp"),
            (coalesce(col("cq"), lit(0L)) + 1).as("cq"))
        val totals = joined.agg(sum(col("cp")).as("np"),
          sum(col("cq")).as("nq"))
        def lnMicro(num: org.apache.spark.sql.Column,
                    den: org.apache.spark.sql.Column) =
          round(round(log(num.cast("double") / den.cast("double")), 4)
            * 10000).cast("long")
        val perBin = joined.crossJoin(broadcast(totals))
          .withColumn("p_micro", expr("cp * 1000000L div np"))
          .withColumn("q_micro", expr("cq * 1000000L div nq"))
          .withColumn("m_micro", expr("(p_micro + q_micro) div 2"))
          .withColumn("raw",
            col("p_micro") * lnMicro(col("p_micro"), col("m_micro"))
              + col("q_micro") * lnMicro(col("q_micro"), col("m_micro")))
        val total = perBin.agg(
          expr("greatest(0L, sum(raw)) div 20000L").as("jsd_micro"))
        perBin.crossJoin(broadcast(total))
          .select(col("bin"), col("p_micro"), col("q_micro"),
            col("raw").as("raw_contrib"), col("jsd_micro"))
          .orderBy(col("bin"))
      },
      Some("""WITH d AS (
             |  SELECT source, n_chars // 50 AS bin FROM documents
             |  WHERE source IN ('src0', 'src1')),
             |bins AS (SELECT DISTINCT bin FROM d),
             |cp AS (SELECT bin, count(*) AS c FROM d
             |       WHERE source = 'src0' GROUP BY bin),
             |cq AS (SELECT bin, count(*) AS c FROM d
             |       WHERE source = 'src1' GROUP BY bin),
             |j AS (
             |  SELECT bin, coalesce(cp.c, 0) + 1 AS cp,
             |         coalesce(cq.c, 0) + 1 AS cq
             |  FROM bins LEFT JOIN cp USING (bin)
             |            LEFT JOIN cq USING (bin)),
             |t AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
             |             CAST(sum(cq) AS BIGINT) AS nq FROM j),
             |m AS (
             |  SELECT bin,
             |    cp * 1000000 // np AS p_micro,
             |    cq * 1000000 // nq AS q_micro,
             |    (cp * 1000000 // np + cq * 1000000 // nq) // 2
             |      AS m_micro
             |  FROM j, t),
             |r AS (
             |  SELECT bin, p_micro, q_micro,
             |    p_micro * CAST(round(round(ln(CAST(p_micro AS DOUBLE)
             |      / CAST(m_micro AS DOUBLE)), 4) * 10000) AS BIGINT)
             |    + q_micro * CAST(round(round(ln(CAST(q_micro AS DOUBLE)
             |      / CAST(m_micro AS DOUBLE)), 4) * 10000) AS BIGINT)
             |      AS raw_contrib
             |  FROM m),
             |tot AS (
             |  SELECT greatest(CAST(0 AS BIGINT),
             |    CAST(sum(raw_contrib) AS BIGINT)) // 20000 AS jsd_micro
             |  FROM r)
             |SELECT bin, p_micro, q_micro, raw_contrib, jsd_micro
             |FROM r, tot ORDER BY bin""".stripMargin)),

    // Zipf rank-frequency slope — the vocabulary-law diagnostic beside
    // the Heaps growth curve (q_corpus_heaps): OLS slope of ln(freq) on
    // ln(rank) over the top-100 terms (natural text sits near −1; a
    // flatter slope flags templated/spammy corpora). Exact BIGINT sums
    // of 4-dp fixed-point logs; the slope is ONE IEEE division of exact
    // (< 2^53) integers. The rank window runs over the 100-row top table
    // — bounded, never the corpus.
    QueryDef(
      "q_corpus_zipf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = load(s, dir, "documents")
          .select(explode(filter(split(col("text"), " "),
            t => t =!= "")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("freq"))
        val top = counts.orderBy(col("freq").desc, col("t")).limit(100)
        val ranked = top.withColumn("rank",
          row_number().over(Window.orderBy(col("freq").desc, col("t")))
            .cast("long"))
        def lnMicro(c: org.apache.spark.sql.Column) =
          round(round(log(c.cast("double")), 4) * 10000).cast("long")
        ranked
          .select(lnMicro(col("rank")).as("x"), lnMicro(col("freq")).as("y"))
          .agg(count(lit(1)).as("n_terms"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("slope_micro",
            round(round(
              (col("n_terms") * col("sxy") - col("sx") * col("sy"))
                .cast("double")
                / (col("n_terms") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"), 6) * 1000000).cast("long"))
      },
      Some("""WITH tk AS (
             |  SELECT t.t
             |  FROM documents,
             |       unnest(list_filter(string_split(text, ' '),
             |                          x -> x <> '')) AS t(t)),
             |f AS (SELECT t, count(*) AS freq FROM tk GROUP BY t),
             |top AS (SELECT t, freq FROM f ORDER BY freq DESC, t LIMIT 100),
             |r AS (
             |  SELECT freq,
             |    row_number() OVER (ORDER BY freq DESC, t) AS rank
             |  FROM top),
             |xy AS (
             |  SELECT
             |    CAST(round(round(ln(CAST(rank AS DOUBLE)), 4) * 10000)
             |      AS BIGINT) AS x,
             |    CAST(round(round(ln(CAST(freq AS DOUBLE)), 4) * 10000)
             |      AS BIGINT) AS y
             |  FROM r),
             |s AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_terms,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM xy)
             |SELECT n_terms, sx, sy, sxx, sxy,
             |  CAST(round(round(
             |    CAST(n_terms * sxy - sx * sy AS DOUBLE)
             |      / CAST(n_terms * sxx - sx * sx AS DOUBLE),
             |    6) * 1000000) AS BIGINT) AS slope_micro
             |FROM s""".stripMargin)),

    // Fellegi-Sunter probabilistic linkage scoring (Fellegi & Sunter
    // 1969 — the decision theory behind every production record-linkage
    // system, splink/JedAI included) over the sorted-neighborhood
    // candidates: each field comparison contributes its log2(m/u)
    // agreement weight or log2((1-m)/(1-u)) disagreement weight; the
    // summed score classifies match / clerical-review / non-match at
    // the two thresholds. The m/u priors are FIXED model constants, so
    // every weight is a precomputed integer micro-literal and the whole
    // score is exact BIGINT addition — the float model lives outside
    // the query. Fields come from the customer row behind each entity
    // (twins share their base's attributes, so they agree everywhere
    // and score as strong matches; window neighbors rarely agree on
    // nation AND balance bucket). Scale shape: blocking bounds
    // candidates (window per sort rank); scoring is a per-pair
    // projection after two broadcast-able attribute joins.
    //   seg:    m=.95 u=.20 -> +2247928 / -4000000
    //   nation: m=.95 u=.04 -> +4569856 / -4263034
    //   balkb:  m=.90 u=.10 -> +3169925 / -3169925
    QueryDef(
      "q_linkage_fs",
      (s, dir) => {
        val ents = entityFixture(load(s, dir, "customer"))
        val cands = Linkage.sortedNeighborhoodPairs(ents, "ent_id",
          "name", window = 3, maxDist = Int.MaxValue)
        val attrs = load(s, dir, "customer")
          .select(col("c_custkey").as("base_id"),
            col("c_mktsegment").as("seg"),
            col("c_nationkey").as("nat"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("balkb"))
        val withA = cands
          .withColumn("base_a", col("id_a") % 100000)
          .withColumn("base_b", col("id_b") % 100000)
          .join(attrs.select(col("base_id").as("base_a"),
            col("seg").as("seg_a"), col("nat").as("nat_a"),
            col("balkb").as("balkb_a")), "base_a")
          .join(attrs.select(col("base_id").as("base_b"),
            col("seg").as("seg_b"), col("nat").as("nat_b"),
            col("balkb").as("balkb_b")), "base_b")
        withA
          .withColumn("fs_micro",
            when(col("seg_a") === col("seg_b"), lit(2247928L))
              .otherwise(lit(-4000000L)) +
            when(col("nat_a") === col("nat_b"), lit(4569856L))
              .otherwise(lit(-4263034L)) +
            when(col("balkb_a") === col("balkb_b"), lit(3169925L))
              .otherwise(lit(-3169925L)))
          .withColumn("decision",
            when(col("fs_micro") >= 4000000L, lit("match"))
              .when(col("fs_micro") <= -4000000L, lit("nonmatch"))
              .otherwise(lit("review")))
          .select(col("id_a"), col("id_b"), col("fs_micro"),
            col("decision"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT c_custkey AS ent_id,
             |    c_mktsegment || '-' ||
             |      substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS name
             |  FROM customer WHERE c_custkey < 300),
             |twin AS (
             |  SELECT ent_id + 100000 AS ent_id,
             |    substr(name, 1, len(name) - 1) || 'x' AS name
             |  FROM base WHERE ent_id % 5 = 0),
             |ents AS (
             |  SELECT * FROM base UNION ALL SELECT * FROM twin),
             |rk AS (
             |  SELECT ent_id, name,
             |    row_number() OVER (ORDER BY name, ent_id) - 1 AS r
             |  FROM ents),
             |p AS (
             |  SELECT a.ent_id AS id_a, b.ent_id AS id_b
             |  FROM rk a JOIN rk b ON b.r > a.r AND b.r <= a.r + 2),
             |attrs AS (
             |  SELECT c_custkey AS base_id, c_mktsegment AS seg,
             |    c_nationkey AS nat,
             |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balkb
             |  FROM customer),
             |sc AS (
             |  SELECT p.id_a, p.id_b,
             |    (CASE WHEN a.seg = b.seg THEN 2247928
             |          ELSE -4000000 END
             |     + CASE WHEN a.nat = b.nat THEN 4569856
             |            ELSE -4263034 END
             |     + CASE WHEN a.balkb = b.balkb THEN 3169925
             |            ELSE -3169925 END) AS fs_micro
             |  FROM p
             |  JOIN attrs a ON a.base_id = p.id_a % 100000
             |  JOIN attrs b ON b.base_id = p.id_b % 100000)
             |SELECT id_a, id_b, CAST(fs_micro AS BIGINT) AS fs_micro,
             |  CASE WHEN fs_micro >= 4000000 THEN 'match'
             |       WHEN fs_micro <= -4000000 THEN 'nonmatch'
             |       ELSE 'review' END AS decision
             |FROM sc ORDER BY id_a, id_b""".stripMargin)),

    // Curriculum ordering (Bengio 2009 easy-first scheduling, the shape
    // length/difficulty-staged pretraining runs use): every document
    // gets a deterministic global training position — difficulty
    // buckets FIRST (fixed n_chars thresholds, so no global window ever
    // touches the corpus), hash-shuffled WITHIN each bucket (md5 order
    // decorrelates difficulty inside a stage), positions offset by the
    // cumulative counts of easier buckets. Scale shape: the only
    // corpus-sized operations are one projection and one
    // per-bucket-partitioned row_number; the offsets come from a ≤10-row
    // aggregate joined back via broadcast. A single global
    // orderBy/ntile would be the anti-pattern this shape exists to
    // avoid.
    QueryDef(
      "q_curriculum_order",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = load(s, dir, "documents")
          .select(col("doc_id"),
            least(expr("n_chars div 200"), lit(9L)).as("bucket"))
        val ranked = docs.withColumn("rnk",
          row_number().over(Window.partitionBy(col("bucket"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        val offsets = docs.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("off",
            coalesce(sum(col("n")).over(
              Window.orderBy(col("bucket"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("off"))
        ranked.join(broadcast(offsets), "bucket")
          .select(col("doc_id"), col("bucket"),
            (col("off") + col("rnk") - 1).as("pos"))
          .orderBy(col("pos"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, least(n_chars // 200, 9) AS bucket
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, bucket,
             |    row_number() OVER (PARTITION BY bucket
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
             |  FROM d),
             |o AS (
             |  SELECT bucket,
             |    CAST(coalesce(sum(n) OVER (ORDER BY bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS off
             |  FROM (SELECT bucket, count(*) AS n FROM d GROUP BY bucket))
             |SELECT r.doc_id, r.bucket, o.off + r.rnk - 1 AS pos
             |FROM r JOIN o USING (bucket)
             |ORDER BY pos""".stripMargin)),
  )

  /** Noisy-entity fixture: base entities named segment-md5hex8 off the
    * customer table, plus a last-character-flipped twin for every 5th —
    * deterministic, so the DuckDB oracle rebuilds it verbatim. */
  private def entityFixture(customer: org.apache.spark.sql.DataFrame) = {
    val base = customer.filter(col("c_custkey") < 300)
      .select(col("c_custkey").as("ent_id"),
        concat(col("c_mktsegment"), lit("-"),
          substring(md5(col("c_custkey").cast("string")), 1, 8)).as("name"))
    val twin = base.filter(col("ent_id") % 5 === 0)
      .select((col("ent_id") + 100000).as("ent_id"),
        concat(expr("substring(name, 1, length(name) - 1)"), lit("x"))
          .as("name"))
    base.unionByName(twin)
  }
}
