package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training and encoding —
  * the tokenizer step of a training-data pipeline (the engine already
  * COUNTS with a fixed merge table via q_token_bpe; this LEARNS the table
  * and ENCODES with it).
  *
  * Reference anchor: none in repype — brief-mandated text-analysis family
  * ("token counting (whitespace + a BPE-ish regex)") extended to training,
  * following Sennrich et al. 2016's word-frequency formulation.
  *
  * Scale shape (the standard practice, same as HuggingFace's trainer): BPE
  * statistics are a function of the WORD-FREQUENCY table, not the raw
  * corpus — so the corpus is scanned ONCE into `(word, count)` (one
  * shuffle, map-side combined; the table is vocabulary-bounded, millions
  * of rows at web scale vs billions of documents). Each merge round then
  * runs entirely on that bounded table: adjacent-symbol-pair counts are
  * one hash aggregate, the argmax pair is a 1-row collect (the driver's
  * fixed-point state, same contract as k-means centroids), and the merge
  * applies as one codegen'd `replace`. Driver state after K rounds is the
  * K-row merge table itself — corpus size never reaches the driver.
  * Encoding then BROADCASTS the (word → segmentation) vocabulary back
  * against the corpus — per-document cost is a broadcast-hash lookup per
  * word, no shuffle of text.
  */
object Tokenization {

  /** Escape a corpus token for embedding in a SQL string literal. */
  private val q = (s: String) => s.replace("\\", "\\\\").replace("'", "\\'")

  /** Memo of completed training runs, keyed by (session, canonicalized
    * corpus plan, text column, merge count): a session that both LEARNS a
    * tokenizer and ENCODES with it (the normal pipeline shape) pays the
    * K-round training — 1 driver round-trip per merge — exactly once.
    * Entries are tiny (the K-row merge table plus a lazy plan; the
    * vocabulary DataFrame is never collected), and the cached plan stays
    * correct even if the underlying persisted `words` table is evicted:
    * re-running an action just recomputes it from the corpus with ZERO
    * new driver round-trips, because the learned merges are interpolated
    * into the plan as literals. */
  private val trained = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Int),
    () => (Seq[(Int, String, Long)], DataFrame)]

  /** Memo entries above this are all dropped (whole-map clear — a
    * session training over this many distinct corpora is a sweep, not a
    * pipeline, and per-entry LRU bookkeeping isn't worth it). */
  private val MaxTrained = 64

  private def trainLoop(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Int, String, Long)], DataFrame) = {
    val key = (docs.sparkSession,
      docs.queryExecution.analyzed.canonicalized, textCol, numMerges)
    // the object monitor guards ONLY the map; the training itself runs
    // under the holder's own lazy-val lock, so concurrent callers of the
    // SAME corpus share one run while different corpora (or a pure memo
    // read) never block behind a minutes-long training
    val holder = synchronized {
      if (trained.size > MaxTrained) trained.clear()
      trained.getOrElseUpdate(key, {
        lazy val r = trainLoopUncached(docs, textCol, numMerges)
        () => r
      })
    }
    holder()
  }

  /** Drop every memoized training. graft.Bench calls this before EACH
    * timed rep: the frozen q_bpe_learn budget was measured with training
    * paid per rep, and a memo hit would silently turn reps 2-3 into
    * no-ops and report a fantasy number. Pipeline sessions (Verify, the
    * examples) never call it — they get the train-once sharing.
    *
    * CAVEAT: the memo key is the canonicalized READ PLAN, which for a
    * file source is path-based — a session that trains on a path, then
    * REWRITES that path's files and retrains, gets the stale merge
    * table back. Call this between the rewrite and the retrain (cache
    * invalidation by content hash is deliberately out of scope: the
    * supported pipeline shape writes derived corpora to new paths). */
  def invalidateTrained(): Unit = synchronized { trained.clear() }

  /** The training loop shared by [[learnBpeMerges]] and
    * [[bpeTokenCounts]]: returns the K learned merges and the final
    * (w, sym, cnt) vocabulary table with each word's merged segmentation.
    *
    * BATCHED rounds: one scan of the vocabulary table serves MANY
    * merges, not one — a 30k-merge production tokenizer cannot pay one
    * driver round-trip per merge (30k serialized Spark jobs is hours of
    * pure scheduling latency even though each is cheap). Per scan the
    * driver collects the top-T pairs and accepts the maximal PREFIX (in
    * (count desc, pair asc) order) whose pairs are pairwise
    * symbol-disjoint, truncated to counts STRICTLY above the first
    * rejected candidate's count. That prefix is provably the exact
    * greedy Sennrich sequence:
    *
    *   - merging (a,b) only changes counts of pairs CONTAINING a or b
    *     (they can only decrease) and CREATES pairs containing the new
    *     symbol ab, each of whose counts is bounded by an old pair
    *     sharing a symbol with (a,b) — every occurrence of (x,ab) was
    *     an occurrence of (x,a);
    *   - every pair sharing a symbol with an accepted pair sorts
    *     at-or-after the stop candidate (else the scan would have
    *     stopped there), so its count — and hence every created pair's
    *     count — is ≤ the stop count;
    *   - each kept pair's count is strictly above the stop count, so at
    *     its sequential round it still beats every decreased, unchanged,
    *     and newly created pair; within the batch, counts of disjoint
    *     pairs are mutually unaffected.
    *
    * Ties (kept count == stop count) fall back to accepting just the
    * head pair — the head is the global (count, lex) argmax, i.e.
    * exactly the sequential choice — so progress is always ≥ 1
    * merge/scan and typical batches are tens of merges. The vocabulary
    * table is localCheckpoint'd each batch: lineage (one codegen'd
    * `replace` chain per batch) stays bounded instead of growing to
    * numMerges nested expressions, and each scan reads a
    * vocabulary-bounded materialized table, never the corpus.
    */
  /** Boundary-aware merge on the `sym` column: double the INTERNAL
    * delimiters and wrap ("t|h|e" → "|t||h||e|") so the search literal
    * "|a||b|" can only match whole adjacent symbols — a plain
    * replace(sym,'h|e','he') would also hit "th|e" across the t·h
    * boundary once symbols grow multi-character, merging a pair that was
    * never learned. The replacement "|ab|" keeps single pipes at its
    * edges, so adjacent matches never share characters and left-to-right
    * non-overlapping replace = the greedy Sennrich merge order;
    * un-doubling restores the canonical form. Same three plain replaces
    * in the DuckDB oracle ([[bpeRoundsCte]]) — no regex, no lookaround. */
  private def applyMerge(df: DataFrame, pair: String): DataFrame = {
    val search = "|" + pair.replace("|", "||") + "|"
    val repl = "|" + pair.replace("|", "") + "|"
    df.withColumn("sym", expr(
      s"replace(trim(BOTH '|' FROM replace(" +
        s"concat('|', replace(sym, '|', '||'), '|'), " +
        s"'${q(search)}', '${q(repl)}')), '||', '|')"))
  }

  private def trainLoopUncached(docs: DataFrame, textCol: String,
                                numMerges: Int)
      : (Seq[(Int, String, Long)], DataFrame) = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    // ONE corpus scan: whitespace words → frequency table → symbol form.
    // Persisted: every merge round re-reads this (tiny) table, never the
    // corpus. concat_ws over split("") inserts '|' between characters.
    val words = Caches.track(docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), concat_ws("|", split(col("w"), "")).as("sym"),
        col("cnt")))

    // adjacent symbol pairs of one row: zip the symbol list with its own
    // tail (zip_with pads the tail with null; filter drops the pad slot)
    val pairsOf = expr(
      """filter(
        |  zip_with(split(sym, '\\|'),
        |           slice(split(sym, '\\|'), 2, size(split(sym, '\\|'))),
        |           (a, b) -> concat(a, '|', b)),
        |  x -> x is not null)""".stripMargin)

    var cur = words
    val merges = Seq.newBuilder[(Int, String, Long)]
    var done = 0
    while (done < numMerges) {
      val remaining = numMerges - done
      // top-T candidates; T beyond `remaining` only serves to locate the
      // stop candidate, so a small margin suffices
      val t = math.max(64, math.min(1024, 4 * remaining))
      val cand = cur
        .select(explode(pairsOf).as("pair"), col("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pcnt"))
        .orderBy(col("pcnt").desc, col("pair").asc)
        .limit(t)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      if (cand.isEmpty) {
        done = numMerges // fully merged vocabulary: nothing left to learn
      } else {
        val touched = scala.collection.mutable.Set.empty[String]
        val prefix = Seq.newBuilder[(String, Long)]
        var nAccepted = 0
        var stopCount = -1L // count of the first unaccepted candidate
        var i = 0
        var stopped = false
        while (i < cand.length && !stopped && nAccepted < remaining) {
          val (pair, cnt) = cand(i)
          val d = pair.indexOf('|')
          val (s1, s2) = (pair.substring(0, d), pair.substring(d + 1))
          if (touched.contains(s1) || touched.contains(s2)) {
            stopCount = cnt
            stopped = true
          } else {
            prefix += ((pair, cnt))
            nAccepted += 1
            touched += s1
            touched += s2
            i += 1
          }
        }
        if (!stopped) {
          // ended by `remaining` or by list exhaustion: the first
          // unaccepted candidate (if any) bounds every conflicting pair;
          // an exhausted top-T list may hide smaller pairs below it
          if (nAccepted < cand.length) stopCount = cand(nAccepted)._2
          else if (cand.length == t) stopCount = cand.last._2
        }
        val all = prefix.result()
        // strict truncation: a created pair can TIE the stop count and
        // win the (count, lex) order, so ties are not provably greedy
        val kept0 = if (stopCount < 0) all
          else all.takeWhile(_._2 > stopCount)
        // no provable batch → the head alone IS the sequential argmax
        val kept = if (kept0.isEmpty) all.take(1) else kept0
        kept.foreach { case (pair, cnt) =>
          done += 1
          merges += ((done, pair, cnt))
          cur = applyMerge(cur, pair)
        }
        // bound lineage to one batch's replace chain; the table is
        // vocabulary-sized, so materialization is cheap
        cur = cur.localCheckpoint()
      }
    }
    (merges.result(), cur)
  }

  /** Learn the first `numMerges` BPE merges over whitespace-tokenized
    * `textCol`, weighted by word frequency. Returns one row per merge:
    * (rank 1-based, pair "a|b", pair_cnt).
    *
    * Symbols are '|'-delimited inside a word ("key" → "k|e|y"); a merge
    * replaces every non-overlapping WHOLE-SYMBOL occurrence left-to-right
    * (greedy Sennrich order), implemented as a delimiter-doubled SQL
    * `replace` so a match can never straddle a symbol boundary — plain
    * string replace would corrupt segmentations once symbols grow
    * multi-character (see trainLoop). All three replaces have identical
    * semantics in Spark and DuckDB, which is what makes the oracle
    * expressible. Ties on count break to the lexicographically smallest
    * pair, so the learned table is deterministic for a given corpus.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String,
                     numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, _) = trainLoop(docs, textCol, numMerges)
    import spark.implicits._
    merges.toDF("rank", "pair", "pair_cnt")
  }

  /** ENCODE with a freshly learned merge table: per-document BPE token
    * counts under the first `numMerges` merges. The learned vocabulary —
    * (word → number of symbols after all merges), vocabulary-bounded —
    * broadcasts against the corpus' exploded words, so encoding costs a
    * broadcast-hash probe per word plus one per-doc sum; the text itself
    * never shuffles. Returns (idCol, n_words, n_tokens): n_tokens ≤
    * chars-per-word · n_words and shrinks as merges are added — the
    * compression the tokenizer exists for. */
  def bpeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
                     numMerges: Int): DataFrame = {
    val (_, vocab) = trainLoop(docs, textCol, numMerges)
    val ntok = broadcast(vocab.select(col("w"),
      size(split(col("sym"), "\\|")).cast("long").as("ntok")))
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(ntok, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
  }

  /** Shared CTE prefix for the DuckDB oracles: the same word-frequency →
    * pair-count → argmax → replace rounds as the engine, one interpolated
    * block per merge (the pagerankOracle pattern — parameters interpolate
    * so query and oracle cannot drift). `w{numMerges}` is the final
    * vocabulary (w, sym, cnt). */
  private def bpeRoundsCte(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { i =>
      val prev = if (i == 1) "w0" else s"w${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT s.sym[g.i] || '|' || s.sym[g.i+1] AS pair, sum(w.cnt) AS pcnt
         |  FROM $prev w,
         |       LATERAL (SELECT string_split(w.sym, '|') AS sym) s,
         |       LATERAL (SELECT unnest(generate_series(1, len(s.sym)-1)) AS i) g
         |  GROUP BY 1),
         |m$i AS MATERIALIZED (
         |  SELECT pair, pcnt FROM p$i ORDER BY pcnt DESC, pair LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT w, replace(trim(replace(
         |      '|' || replace(sym, '|', '||') || '|',
         |      '|' || replace((SELECT pair FROM m$i), '|', '||') || '|',
         |      '|' || replace((SELECT pair FROM m$i), '|', '') || '|'),
         |    '|'), '||', '|') AS sym,
         |         cnt
         |  FROM $prev)""".stripMargin
    }
    s"""w0 AS MATERIALIZED (
       |  SELECT w, array_to_string(string_split(w, ''), '|') AS sym,
       |         count(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** DuckDB oracle for [[learnBpeMerges]]. */
  def bpeOracleSql(numMerges: Int): String = {
    val sel = (1 to numMerges).map(i =>
      s"SELECT $i AS rank, (SELECT pair FROM m$i) AS pair, " +
        s"(SELECT CAST(pcnt AS BIGINT) FROM m$i) AS pair_cnt")
    s"""WITH ${bpeRoundsCte(numMerges)}
       |${sel.mkString(" UNION ALL ")}
       |ORDER BY rank""".stripMargin
  }

  /** DuckDB oracle for [[bpeTokenCounts]]: the same rounds, then the
    * final vocabulary joins back against each document's words. */
  def bpeEncodeOracleSql(numMerges: Int): String =
    s"""WITH ${bpeRoundsCte(numMerges)}
       |SELECT d.doc_id, count(*) AS n_words,
       |  CAST(sum(len(string_split(v.sym, '|'))) AS BIGINT) AS n_tokens
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents) d
       |JOIN w$numMerges v USING (w)
       |WHERE d.w <> ''
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Pretrained path — the production tokenizer shape: the merge table
  // SHIPS AS DATA (like the bundled Public Suffix List), training never
  // runs at encode time.
  // ------------------------------------------------------------------

  /** Encode under a FIXED merge table. Unlike [[bpeTokenCounts]] (which
    * trains first, one driver round-trip per merge batch), the pretrained
    * path has ZERO training round-trips: the corpus scans once into its
    * distinct-word table and all M merges chain into one codegen'd
    * replace expression over that vocabulary-bounded table — encode cost
    * is independent of M's history, exactly how a shipped tiktoken-style
    * vocabulary behaves. `merges` must be in learned order ("a|b" form);
    * applying them in order reproduces the trainer's segmentation on any
    * corpus (LlmSpec pins self-consistency: encode-with-learned-merges ≡
    * learn-then-encode). */
  def bpeTokenCountsPretrained(docs: DataFrame, textCol: String,
                               idCol: String,
                               merges: Seq[String]): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .select(col("w"), concat_ws("|", split(col("w"), "")).as("sym"))
    val vocab = merges.foldLeft(words)(applyMerge)
    val ntok = broadcast(vocab.select(col("w"),
      size(split(col("sym"), "\\|")).cast("long").as("ntok")))
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(ntok, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
  }

  /** Train on `docs` and PERSIST the merge table — the tokenizer-model
    * artifact (rank, pair, pair_cnt) a deployment trains once and every
    * later job reads ([[bpeTokenCountsWithModel]]). Completes the
    * persisted-artifact trio: MinHash index, IVF index, BPE model. */
  def writeBpeModel(docs: DataFrame, textCol: String, path: String,
                    numMerges: Int): Unit =
    learnBpeMerges(docs, textCol, numMerges)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Encode against a persisted model ([[writeBpeModel]]): the merge
    * table loads as bounded driver state (M rows, ordered by rank) and
    * feeds [[bpeTokenCountsPretrained]] — no training, no dependence on
    * the training corpus. */
  def bpeTokenCountsWithModel(docs: DataFrame, textCol: String,
                              idCol: String, modelPath: String): DataFrame = {
    val merges = docs.sparkSession.read.parquet(modelPath)
      .orderBy(col("rank")).collect().map(_.getAs[String]("pair")).toSeq
    bpeTokenCountsPretrained(docs, textCol, idCol, merges)
  }

  /** DuckDB oracle for [[bpeTokenCountsPretrained]]: the SAME fixed
    * merge literals, applied as the same chained boundary-aware replaces
    * over the distinct-word table. */
  def bpePretrainedOracleSql(merges: Seq[String]): String = {
    val rounds = merges.zipWithIndex.map { case (pair, i) =>
      val prev = if (i == 0) "w0" else s"w$i"
      val search = "|" + pair.replace("|", "||") + "|"
      val repl = "|" + pair.replace("|", "") + "|"
      def sq(s: String) = s.replace("'", "''")
      s"""w${i + 1} AS MATERIALIZED (
         |  SELECT w, replace(trim(replace(
         |      '|' || replace(sym, '|', '||') || '|',
         |      '${sq(search)}', '${sq(repl)}'),
         |    '|'), '||', '|') AS sym
         |  FROM $prev)""".stripMargin
    }
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w, array_to_string(string_split(w, ''), '|') AS sym
       |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE w <> ''),
       |${rounds.mkString(",\n")}
       |SELECT d.doc_id, count(*) AS n_words,
       |  CAST(sum(len(string_split(v.sym, '|'))) AS BIGINT) AS n_tokens
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents) d
       |JOIN w${merges.length} v USING (w)
       |WHERE d.w <> ''
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }
}
