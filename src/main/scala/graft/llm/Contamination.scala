package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-decontamination and corpus n-gram statistics for
  * training-data pipelines.
  *
  * Scale design: candidate generation is always an equi-join on a narrow
  * hashed key (8-byte shingle hash), never raw text through a shuffle.
  * The benchmark side of decontamination is small by nature (eval sets);
  * it is explicitly broadcast so the train-side scan is the only pass
  * over the corpus. N-gram counting is explode → one partial→final hash
  * aggregate; the top-k is a TakeOrdered, not a global sort.
  */
object Contamination {

  /** Distinct char-shingle xxhash64 values per row of `textCol`.
    * Hashing keeps the shuffle narrow (8 bytes vs `shingleSize` chars);
    * collisions over a corpus' shingle vocabulary are ~n²/2^65 —
    * irrelevant next to the false-positive rate of shingling itself. */
  private def shingleHashes(textCol: Column, shingleSize: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(textCol) - (shingleSize - 1), lit(1))),
      i => xxhash64(textCol.substr(i, lit(shingleSize)))))

  /** Benchmark decontamination: for each training document, the number of
    * distinct `shingleSize`-char shingles it shares with ANY benchmark
    * document. Rows with `n_shared > 0` are contamination suspects (the
    * exact-substring-overlap check every serious LLM data pipeline runs
    * against its eval sets before training).
    */
  def sharedShingles(train: DataFrame, benchmark: DataFrame,
                     shingleSize: Int = 20, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val trainSh = train.select(col(idCol).as("doc_id"),
      explode(shingleHashes(col(textCol), shingleSize)).as("sh"))
    val benchSh = benchmark
      .select(explode(shingleHashes(col(textCol), shingleSize)).as("sh"))
      .distinct()
    // per-doc shingles are already distinct (array_distinct) and the
    // benchmark side is globally distinct, so the join emits each shared
    // (doc, shingle) once: count(*) IS the distinct shared-shingle count
    trainSh.join(broadcast(benchSh), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** FUZZY decontamination — the MinHash complement of the exact
    * shingle-overlap rule: a train document is contaminated when its
    * ESTIMATED Jaccard against any benchmark document reaches
    * `minJaccard`, catching the lightly-paraphrased leakage exact
    * shingles miss (the published near-dup-against-eval sweep). Returns
    * one row per train doc: (doc_id, contaminated 0/1, n_hits).
    *
    * Scale shape: candidate generation delegates to
    * [[Dedup.incrementalMinhashMatches]]'s asymmetric band-bucket join
    * (train bands × the benchmark signature side only, with the hot-
    * bucket star cap) — cost tracks the train side and the benchmark's
    * banded signatures, never train × benchmark; the flag join back is
    * one aggregate of the (small) match list. */
  def fuzzyContamination(train: DataFrame, benchmark: DataFrame,
                         minJaccard: Double = 0.8, numHashes: Int = 64,
                         bands: Int = 16, shingleSize: Int = 5,
                         textCol: String = "text", idCol: String = "doc_id",
                         maxBucketSize: Int = 500): DataFrame = {
    val matches = Dedup.incrementalMinhashMatches(benchmark, train,
      numHashes, bands, shingleSize, textCol, idCol, maxBucketSize)
    val hits = matches.filter(col("est_jaccard") >= minJaccard)
      .groupBy(col("batch_id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        col("n_hits").isNotNull.cast("int").as("contaminated"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Embedding-space decontamination — the SEMANTIC complement of the
    * shingle and MinHash rules (a well-paraphrased eval leak shares no
    * shingles at ANY fuzz level, but it does sit next to its benchmark
    * item in embedding space — the SemDeDup observation applied to eval
    * integrity): a train vector is contaminated when its cosine against
    * ANY benchmark vector reaches `minCosMicro` (4-dp fixed point).
    *
    * Scale shape: the benchmark side BROADCASTS by the family contract
    * (eval suites are thousands of items, not corpora) and the train
    * side streams once — the [[Similarity.bruteForceTopK]] shape with a
    * threshold instead of a rank. Cosines integerize BEFORE the
    * compare, so verdicts are exact and the oracle replays the whole
    * thing (no gate). If an eval suite ever outgrows broadcast, swap
    * candidate generation to the IVF cell join (the `marginPairsAnn`
    * shape) — the verdict math is unchanged. `max_cos_micro` is 0 for
    * clean rows (documented: "no hit at or above 0"). */
  def semanticContamination(train: DataFrame, benchmark: DataFrame,
                            minCosMicro: Long = 9000L,
                            vecCol: String = "embedding",
                            idCol: String = "vec_id"): DataFrame = {
    import Similarity.{dot, l2norm}
    val t = train.select(col(idCol).as("train_id"), col(vecCol).as("t_vec"))
      .withColumn("t_norm", l2norm(col("t_vec")))
    val b = benchmark.select(col(idCol).as("bench_id"),
        col(vecCol).as("b_vec"))
      .withColumn("b_norm", l2norm(col("b_vec")))
    val hits = t.crossJoin(broadcast(b))
      .withColumn("c_micro",
        round(round(dot(col("t_vec"), col("b_vec"))
          / (col("t_norm") * col("b_norm")), 4) * 10000).cast("long"))
      .filter(col("c_micro") >= minCosMicro)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("c_micro")).as("max_c"))
    train.select(col(idCol).as("train_id"))
      .join(hits, Seq("train_id"), "left")
      .select(col("train_id"),
        col("n_hits").isNotNull.cast("int").as("contaminated"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("max_c"), lit(0L)).as("max_cos_micro"))
  }

  /** The eval-integrity direction of [[sharedShingles]]: a per-BENCHMARK-
    * item contamination report — for each benchmark doc, how many distinct
    * training docs share ≥1 shingle with it and how many distinct
    * (train doc, shingle) overlaps exist. This is the table an eval owner
    * reads to decide which items to retire; the train-side view decides
    * which corpus docs to drop. Same scale shape: the benchmark side (ids
    * + shingles this time) broadcasts, the train side never collects.
    */
  def contaminationReport(train: DataFrame, benchmark: DataFrame,
                          shingleSize: Int = 20, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val trainSh = train.select(col(idCol).as("train_id"),
      explode(shingleHashes(col(textCol), shingleSize)).as("sh"))
    val benchSh = benchmark.select(col(idCol).as("bench_id"),
      explode(shingleHashes(col(textCol), shingleSize)).as("sh"))
    trainSh.join(broadcast(benchSh), "sh")
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        count(lit(1)).as("n_overlaps"))
  }

  /** Benchmark decontamination with a Bloom prefilter — exact same output
    * contract as [[sharedShingles]], different 100 TB shape: a distributed
    * Bloom build over the benchmark shingles
    * ([[graft.functions.BloomFunctions]]) becomes a plan-literal predicate
    * that drops ~all clean train shingles BEFORE any exchange; only
    * survivors (true hits + the sketch's ~2% FPs) reach the exact confirm
    * join, which eliminates the FPs. The confirm join carries no hint:
    * when the benchmark side fits the broadcast threshold AQE broadcasts
    * it, and when an eval suite outgrows broadcast the join shuffles —
    * but by then the corpus side is prefiltered to ~the contamination
    * rate, so the exchange is small either way.
    */
  def sharedShinglesBloom(train: DataFrame, benchmark: DataFrame,
                          shingleSize: Int = 20, textCol: String = "text",
                          idCol: String = "doc_id",
                          expectedItems: Long = 1L << 16,
                          numBits: Long = 1L << 20): DataFrame = {
    // consumed twice (bloom-build action + confirm join): persist so the
    // benchmark shingling runs once; Caches.release()/clearCache frees it
    val benchSh = Caches.track(benchmark
      .select(explode(shingleHashes(col(textCol), shingleSize)).as("sh"))
      .distinct())
    // empty benchmark → no contamination, same as sharedShingles (the
    // bloom build would otherwise fail on a null sketch)
    if (benchSh.isEmpty) {
      return train.select(col(idCol).as("doc_id")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared")).limit(0)
    }
    val bloom = graft.functions.BloomFunctions.buildBloom(
      benchSh, col("sh"), expectedItems, numBits)
    train
      .select(col(idCol).as("doc_id"),
        explode(shingleHashes(col(textCol), shingleSize)).as("sh"))
      .filter(graft.functions.BloomFunctions.mightContain(bloom, col("sh")))
      .join(benchSh, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Corpus-level top-k word n-grams by occurrence count (heavy-hitter
    * phrases — boilerplate detection, quality filters). Per-row expression
    * explode, one hash aggregate, TakeOrdered top-k. */
  def topNgrams(documents: DataFrame, n: Int, k: Int,
                textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val grams = when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j)): _*)))
      .otherwise(array())
    documents
      .select(explode(grams).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }
}
