package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-based text metrics — the scoring half of an eval-integrity
  * pipeline (the decontamination ops gate what the eval set contains;
  * these score model output against it at corpus scale).
  *
  * Exactness discipline: every count is a BIGINT; every transcendental
  * step (ln, exp) is ONE IEEE double expression in stated association
  * order over EXACT integer inputs, then 4-dp fixed-pointed — the same
  * ln → 4 dp → micro-units rule the LM-scoring family uses, so DuckDB
  * replays bit for bit.
  */
object EvalMetrics {

  /** All n-grams of `c` (a token array) as space-joined strings; empty
    * when the array is shorter than n. Pure codegen'd higher-order
    * expression — no shuffle. */
  private def grams(c: Column, n: Int): Column =
    when(size(c) >= n,
      transform(sequence(lit(1), size(c) - (n - 1)),
        i => array_join(slice(c, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** 60-bit gram fingerprint (md5 hex prefix as integer): the 8-byte
    * count/join key that keeps gram STRINGS out of every exchange. 15 hex
    * chars < 2^60 so the signed-long cast can't overflow; DuckDB mirror:
    * `CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)`. */
  private def gramFp(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** Corpus-level BLEU (Papineni et al., ACL 2002) over (id, ref, cand)
    * row pairs: modified (clipped) n-gram precisions pooled across the
    * corpus for n = 1..maxN, geometric mean, brevity penalty.
    *
    * One output row:
    *   - `match_n` / `total_n` — exact clipped-match and candidate n-gram
    *     counts (the audit trail);
    *   - `r_len` / `c_len` — reference/candidate token totals;
    *   - `bp_micro` — brevity penalty min(1, e^(1−r/c)), 4-dp micro;
    *   - `bleu_micro` — BP · exp(mean ln p_n), 4-dp micro; 0 when any
    *     p_n is 0 (the published convention for unsmoothed BLEU).
    *
    * Fixed-point mechanics: each ln p_n rounds to 4 dp micro; the mean
    * adds a +2e5 offset per term before the integer division so both
    * engines divide NON-NEGATIVE operands (Spark `div` truncates toward
    * zero, DuckDB `//` floors — they agree only above zero), then
    * removes it. The final exp/multiply are IEEE doubles of exact
    * integers (all < 2^53), association order stated in the expression.
    *
    * Scale shape: per-n gram explosion is codegen'd per-row work; counts
    * are two hash aggregates keyed by (pair, n, FINGERPRINT) where the
    * fingerprint is the md5-derived 60-bit integer of the gram — the
    * gram string itself never shuffles (ScaleCheck measured the string
    * variant's clip join going broadcast→SMJ at 10× and re-exchanging
    * full 4-gram strings on both sides: 20× shuffle for 10× data; the
    * fingerprint restored the linear trajectory with an 8-byte key).
    * Collisions are the feature-hashing trade: ~n²/2^61 expected false
    * gram equalities (≈1e-5 at ten million distinct grams) — and the
    * oracle replays the same fingerprint, so cross-engine parity is
    * unconditional. Everything after the per-n rollup is 1-row
    * arithmetic. No windows, no driver state.
    */
  def corpusBleu(pairs: DataFrame, refCol: String = "ref",
                 candCol: String = "cand", idCol: String = "pair_id",
                 maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    def toks(c: String) = filter(split(col(c), " "), t => t =!= "")
    val t = Caches.track(pairs.select(col(idCol).as("pid"),
      toks(refCol).as("rt"), toks(candCol).as("ct")))

    val lens = t.agg(sum(size(col("rt"))).cast("long").as("r_len"),
      sum(size(col("ct"))).cast("long").as("c_len"))

    def counted(tokCol: String, out: String): DataFrame =
      (1 to maxN).map { n =>
        t.select(col("pid"), lit(n).as("n"),
            explode(grams(col(tokCol), n)).as("g"))
          .groupBy(col("pid"), col("n"), gramFp(col("g")).as("gh"))
          .agg(count(lit(1)).as(out))
      }.reduce(_ unionByName _)

    val cc = counted("ct", "ccnt")
    val rc = counted("rt", "rcnt")
    val perN = cc.join(rc, Seq("pid", "n", "gh"), "left")
      .select(col("n"), col("ccnt"),
        least(col("ccnt"), coalesce(col("rcnt"), lit(0L))).as("clip"))
      .groupBy(col("n"))
      .agg(sum(col("clip")).as("m"), sum(col("ccnt")).as("tot"))

    val aggs = (1 to maxN).flatMap { n =>
      Seq(sum(when(col("n") === n, col("m"))).as(s"match_$n"),
        sum(when(col("n") === n, col("tot"))).as(s"total_$n"))
    }
    val wide = perN.groupBy().agg(aggs.head, aggs.tail: _*)

    val k = 200000L // ln p_n > -20 for any non-empty corpus
    val withLn = (1 to maxN).foldLeft(wide.crossJoin(broadcast(lens))) {
      (df, n) =>
        // 0 placeholder at match=0 keeps the arithmetic total (anyZero
        // zeroes the final score anyway; ln(0) is null/-inf territory)
        df.withColumn(s"ln_$n",
          when(col(s"match_$n") === 0, lit(0L)).otherwise(
            round(round(log(col(s"match_$n").cast("double")
              / col(s"total_$n").cast("double")), 4) * 10000)
              .cast("long")))
    }
    // mean of the ln micros under a +k offset so both engines divide
    // non-negative operands (trunc ≡ floor above zero)
    val lbar = expr(s"(${(1 to maxN).map(n => s"ln_$n").mkString(" + ")}" +
      s" + ${maxN * k}L) div ${maxN}L - ${k}L")
    val anyZero = (1 to maxN).map(n => col(s"match_$n") === 0)
      .reduce(_ || _)
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double")
        / col("c_len").cast("double")))

    withLn
      .withColumn("bp_micro",
        round(round(bp, 4) * 10000).cast("long"))
      .withColumn("bleu_micro",
        when(anyZero, lit(0L)).otherwise(
          round(round(bp * exp(lbar.cast("double") / 10000.0), 4) * 10000)
            .cast("long")))
      .drop((1 to maxN).map(n => s"ln_$n"): _*)
  }

  /** Per-pair token-level F1 (the SQuAD answer metric, Rajpurkar et al.
    * 2016): precision and recall from the CLIPPED unigram overlap
    * (multiset intersection), F1 their harmonic mean. All-integer until
    * the three fixed-point divisions — `overlap·1e6 div total` floor
    * divisions of non-negative operands, engine-identical; F1 =
    * 2pr·1e6 div (p+r) on the already-fixed-pointed p and r (stated
    * order, so the oracle replays bit for bit); 0 whenever a side is
    * empty or the overlap is 0.
    *
    * Scale shape: one explode + one (pair, token) hash aggregate per
    * side, an equi-join on (pair, token), one per-pair rollup — only
    * tokens shuffle, and per-pair state is bounded by pair length. */
  def tokenF1(pairs: DataFrame, refCol: String = "ref",
              candCol: String = "cand",
              idCol: String = "pair_id"): DataFrame = {
    def toks(c: String) = filter(split(col(c), " "), t => t =!= "")
    val t = Caches.track(pairs.select(col(idCol).as("pid"),
      toks(refCol).as("rt"), toks(candCol).as("ct")))
    def counts(tokCol: String, out: String) =
      t.select(col("pid"), explode(col(tokCol)).as("g"))
        .groupBy(col("pid"), col("g")).agg(count(lit(1)).as(out))
    val ov = counts("ct", "ccnt")
      .join(counts("rt", "rcnt"), Seq("pid", "g"))
      .groupBy(col("pid"))
      .agg(sum(least(col("ccnt"), col("rcnt"))).as("overlap"))
    t.select(col("pid"), size(col("rt")).cast("long").as("r_len"),
        size(col("ct")).cast("long").as("c_len"))
      .join(ov, Seq("pid"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("p_micro", when(col("c_len") === 0, lit(0L))
        .otherwise(expr("overlap * 1000000L div c_len")))
      .withColumn("r_micro", when(col("r_len") === 0, lit(0L))
        .otherwise(expr("overlap * 1000000L div r_len")))
      .withColumn("f1_micro",
        when(col("p_micro") + col("r_micro") === 0, lit(0L))
          .otherwise(expr(
            "2 * p_micro * r_micro div (p_micro + r_micro)")))
      .select(col("pid").as("pair_id"), col("overlap"), col("r_len"),
        col("c_len"), col("p_micro"), col("r_micro"), col("f1_micro"))
  }

  /** Corpus ROUGE-N (Lin, 2004): RECALL-oriented n-gram overlap — the
    * summarization complement of BLEU's precision (how much of the
    * REFERENCE the candidate recovers). Pooled over the corpus like the
    * published corpus variant: recall_micro = Σclip·1e6 div Σref_grams,
    * one row per n = 1..maxN. Same clipped counts as [[corpusBleu]] with
    * the roles of the denominators swapped; same shuffle shape. */
  def corpusRougeN(pairs: DataFrame, refCol: String = "ref",
                   candCol: String = "cand", idCol: String = "pair_id",
                   maxN: Int = 2): DataFrame = {
    def toks(c: String) = filter(split(col(c), " "), t => t =!= "")
    val t = Caches.track(pairs.select(col(idCol).as("pid"),
      toks(refCol).as("rt"), toks(candCol).as("ct")))
    def counted(tokCol: String, out: String): DataFrame =
      (1 to maxN).map { n =>
        t.select(col("pid"), lit(n).as("n"),
            explode(grams(col(tokCol), n)).as("g"))
          .groupBy(col("pid"), col("n"), gramFp(col("g")).as("gh"))
          .agg(count(lit(1)).as(out))
      }.reduce(_ unionByName _)
    counted("rt", "rcnt")
      .join(counted("ct", "ccnt"), Seq("pid", "n", "gh"), "left")
      .select(col("n"),
        least(col("rcnt"), coalesce(col("ccnt"), lit(0L))).as("clip"),
        col("rcnt"))
      .groupBy(col("n"))
      .agg(sum(col("clip")).as("match_n"), sum(col("rcnt")).as("ref_total"))
      .withColumn("recall_micro",
        when(col("ref_total") === 0, lit(0L))
          .otherwise(expr("match_n * 1000000L div ref_total")))
  }

  /** Corpus chrF (Popović, WMT 2015; sacrebleu's chrF2 defaults): the
    * CHARACTER n-gram F-score — the MT metric that survives morphology
    * and tokenization differences word metrics trip on. Whitespace is
    * removed (the published default), char n-grams run n = 1..maxN
    * (default 6), statistics pool over the corpus, and the final score
    * is the arithmetic mean over n of F_β with β = 2 (recall-weighted):
    * F = (1+β²)·P·R / (β²·P + R).
    *
    * Exactness: clipped/total counts are BIGINTs; P and R are
    * floor-division micro-units; F is one integer formula over them
    * (5·P·R div (4·P + R), exact); the mean divides the non-negative
    * sum. Grams key by the 60-bit md5 fingerprint like [[corpusBleu]]
    * (strings never shuffle; DuckDB replays the fingerprint). Returns
    * one row per n plus the `chrf_micro` mean on every row. */
  def corpusChrF(pairs: DataFrame, refCol: String = "ref",
                 candCol: String = "cand", idCol: String = "pair_id",
                 maxN: Int = 6): DataFrame = {
    def chars(c: String) = regexp_replace(col(c), "\\s", "")
    val t = Caches.track(pairs.select(col(idCol).as("pid"),
      chars(refCol).as("rs"), chars(candCol).as("cs")))
    def charGrams(c: Column, n: Int): Column =
      when(length(c) >= n,
        transform(sequence(lit(1), length(c) - (n - 1)),
          i => c.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    def counted(sCol: String, out: String): DataFrame =
      (1 to maxN).map { n =>
        t.select(col("pid"), lit(n).as("n"),
            explode(charGrams(col(sCol), n)).as("g"))
          .groupBy(col("pid"), col("n"), gramFp(col("g")).as("gh"))
          .agg(count(lit(1)).as(out))
      }.reduce(_ unionByName _)
    val perN = counted("cs", "ccnt")
      .join(counted("rs", "rcnt"), Seq("pid", "n", "gh"), "full_outer")
      .select(col("n"),
        least(coalesce(col("ccnt"), lit(0L)),
          coalesce(col("rcnt"), lit(0L))).as("clip"),
        coalesce(col("ccnt"), lit(0L)).as("ccnt"),
        coalesce(col("rcnt"), lit(0L)).as("rcnt"))
      .groupBy(col("n"))
      .agg(sum(col("clip")).as("match_n"),
        sum(col("ccnt")).as("cand_total"),
        sum(col("rcnt")).as("ref_total"))
      .withColumn("p_micro", when(col("cand_total") === 0, lit(0L))
        .otherwise(expr("match_n * 1000000L div cand_total")))
      .withColumn("r_micro", when(col("ref_total") === 0, lit(0L))
        .otherwise(expr("match_n * 1000000L div ref_total")))
      .withColumn("f_micro",
        when(lit(4) * col("p_micro") + col("r_micro") === 0, lit(0L))
          .otherwise(expr(
            "5 * p_micro * r_micro div (4 * p_micro + r_micro)")))
    val mean = perN.agg(sum(col("f_micro")).as("fsum"))
      .select(expr(s"fsum div ${maxN}L").as("chrf_micro"))
    perN.crossJoin(broadcast(mean))
      .select(col("n"), col("match_n"), col("cand_total"),
        col("ref_total"), col("p_micro"), col("r_micro"), col("f_micro"),
        col("chrf_micro"))
  }

  /** Per-pair ROUGE-L (Lin 2004, β = 1): longest-common-subsequence
    * alignment — rewards in-order coverage without requiring contiguity,
    * the property n-gram overlap can't see (a candidate with every
    * reference token in scrambled order scores high ROUGE-1 but low
    * ROUGE-L). The LCS kernel is [[graft.functions.LcsLenExpr]], a
    * native codegen'd expression (also SQL-registered as `lcs_len`);
    * per-row DP is the metric's published cost and stays
    * partition-local — no shuffle at all, the whole metric is one
    * codegen'd projection. P/R/F in the exact floor-division micro-unit
    * discipline. */
  def rougeL(pairs: DataFrame, refCol: String = "ref",
             candCol: String = "cand",
             idCol: String = "pair_id"): DataFrame = {
    def toks(c: String) = filter(split(col(c), " "), t => t =!= "")
    pairs.select(col(idCol).as("pair_id"),
        graft.functions.TextExpressions
          .lcsLen(toks(refCol), toks(candCol)).as("lcs"),
        size(toks(refCol)).cast("long").as("r_len"),
        size(toks(candCol)).cast("long").as("c_len"))
      .withColumn("r_micro", when(col("r_len") === 0, lit(0L))
        .otherwise(expr("lcs * 1000000L div r_len")))
      .withColumn("p_micro", when(col("c_len") === 0, lit(0L))
        .otherwise(expr("lcs * 1000000L div c_len")))
      .withColumn("f_micro",
        when(col("p_micro") + col("r_micro") === 0, lit(0L))
          .otherwise(expr(
            "2 * p_micro * r_micro div (p_micro + r_micro)")))
  }

  /** Per-rank nDCG gain 1/log2(rank+1), fixed to 4-dp ×10⁴ integers at
    * BUILD time (both the engine and the generated oracle embed these
    * same literals, so no runtime log2 ever has to agree cross-engine).
    * Index 0 ↔ rank 1. */
  private[graft] val NdcgGains: Seq[Long] =
    Seq(10000L, 6309L, 5000L, 4307L, 3869L, 3562L, 3333L, 3155L, 3010L,
      2891L)
  private[graft] val NdcgGainPrefix: Seq[Long] =
    NdcgGains.scanLeft(0L)(_ + _).tail

  /** Ranking-quality metrics for a retrieval run — nDCG@k, MRR, and
    * recall@k per query (Järvelin & Kekäläinen 2002 for DCG; the
    * standard IR eval battery): `retrieved` carries (query_id, rk,
    * cand_id) from any ranker (e.g. [[Similarity.bruteForceTopK]]);
    * relevance is binary label agreement against `labels` (id → label).
    * INTEGER-EXACT throughout: MRR is one floor division by the first
    * relevant rank, recall by the per-label relevant total, and DCG
    * uses the build-time [[NdcgGains]] literals — so the whole battery
    * hash-replays on any engine.
    *
    * Scale shape: the only force-broadcast is the label-CARDINALITY
    * aggregate (one row per distinct label). The label lookups joined
    * into the retrieved list are corpus-sized (one row per vector), so
    * they are plain equi-joins — AQE broadcasts them when the corpus is
    * small and shuffles them (linear, key-partitioned) when it is not;
    * force-broadcasting a corpus-sized frame would be a driver OOM at
    * production scale. The per-query aggregation runs over the k
    * retrieved rows only. */
  def rankingMetrics(retrieved: DataFrame, labels: DataFrame,
                     k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgGains.size,
      s"k must be in [1, ${NdcgGains.size}]")
    val gains = NdcgGains.take(k)
    val prefix = NdcgGainPrefix.take(k)
    val lab = labels.select(col("vec_id"), col("label"))
    // per-query relevant total = |label class| − 1 (the query itself):
    // one label-cardinality aggregate broadcast back, never a self-join
    val labCounts = lab.groupBy(col("label"))
      .agg(count(lit(1)).as("label_n"))
    val relTotals = lab.join(broadcast(labCounts), "label")
      .select(col("vec_id").as("query_id"),
        (col("label_n") - 1).as("n_rel"))
    val scored = retrieved.filter(col("rk") <= k)
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("q_label")), "query_id")
      .join(lab.select(col("vec_id").as("cand_id"),
        col("label").as("c_label")), "cand_id")
      .withColumn("rel",
        when(col("q_label") === col("c_label"), 1L).otherwise(0L))
      .withColumn("gain",
        element_at(typedLit(gains), col("rk").cast("int")))
    scored.groupBy(col("query_id"))
      .agg(sum(col("rel")).as("hits"),
        min(when(col("rel") === 1L, col("rk"))).as("first_rel"),
        sum(col("rel") * col("gain")).as("dcg"))
      .join(relTotals, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_rel"))
      .withColumn("mrr_micro",
        when(col("first_rel").isNull, lit(0L))
          .otherwise(expr("1000000L div first_rel")))
      .withColumn("recall_micro",
        when(col("n_rel") === 0L, lit(0L))
          .otherwise(expr("hits * 1000000L div n_rel")))
      .withColumn("idcg",
        // clamp the index to >= 1: a singleton label class gives
        // n_rel = 0 and element_at(_, 0) throws UNCONDITIONALLY before
        // the n_rel = 0 CASE below could short-circuit (Spark evaluates
        // the column, DuckDB's CASE doesn't — the guard must live here)
        element_at(typedLit(prefix),
          greatest(least(col("n_rel"), lit(k.toLong)), lit(1L))
            .cast("int")))
      .withColumn("ndcg_micro",
        when(col("n_rel") === 0L, lit(0L))
          .otherwise(expr("dcg * 1000000L div idcg")))
      .select(col("query_id"), col("n_rel"), col("hits"),
        col("mrr_micro"), col("recall_micro"), col("ndcg_micro"))
  }

  /** ANN recall@k against the exact retriever — THE deployment metric
    * for every approximate index (FAISS reports it on every benchmark):
    * per query, the fraction of the exact top-k the approximate run
    * surfaced. Both inputs carry (query_id, cand_id) rows (ranks
    * irrelevant — recall is set overlap); exact floor-division micro.
    * Queries the approximate side missed entirely score 0 (left join
    * from the exact side's query set). */
  def annRecall(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hits = exact.select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("recall_micro",
        expr(s"n_overlap * 1000000L div ${k}L"))
  }
}
