package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Caches, Dedup, Similarity}

/** Scale-trajectory spot-check (BASELINE.md evidence): runs the heaviest
  * dedup/ANN library paths on 1×/3×/10× synthesized copies of the sf0.1
  * corpus and prints one JSON line per (query, factor) with wall seconds
  * and total shuffle read/write bytes.
  *
  * The 2×-budget bench can only show sameness at one scale; this shows the
  * TRAJECTORY — a super-linear time or shuffle-bytes curve here is the
  * local-mode signature of a plan that dies at cluster scale.
  *
  * Synthesis: copy k (k ≥ 1) shifts ids by k·10⁷ and rotates the letters
  * of `text` by k (a per-copy Caesar substitution via `translate`). A
  * bijection on the alphabet preserves the intra-copy near-duplicate
  * structure EXACTLY (token equality, shingle equality, doc lengths all
  * unchanged) while making every letter differ across copies: zero
  * cross-copy WORD-token collisions, and char-shingle collisions only
  * where one rotation of a shingle happens to equal another shingle
  * elsewhere in the corpus (measured: ~19 of ~500k distinct 5-char
  * shingles between any two rotations of the sf0.1 corpus — negligible).
  * (The earlier `c<k>_` token-tagging variant only perturbed shingles
  * near token boundaries — interior char shingles still collided across
  * copies — and inflated doc lengths by the tag bytes.) Without the
  * substitution the k-fold corpus is 90% exact duplicates and pair
  * OUTPUT grows as k², which would masquerade as super-linear runtime.
  * Embeddings are id-shifted only (exact duplicate vectors just add
  * candidates; training/encode/scan cost is what scales).
  */
object ScaleCheck {

  private final class ShuffleListener extends SparkListener {
    val write = new AtomicLong(0L)
    val read = new AtomicLong(0L)
    // per-stage task durations (ms) since the last snapshot — the
    // straggler measure: a skewed reduce key shows up as one task far
    // above its OWN stage's median (cross-stage comparison would be
    // meaningless: a 1-row collect stage is always tiny next to a scan)
    private val stageTasks =
      scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) stageTasks.synchronized {
        stageTasks.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += te.taskInfo.duration
      }
    /** Max over stages with >= `minTasks` tasks of (stage max / stage
      * median) since the last call, then reset — 1.0 when no stage
      * qualifies. The "no straggler task > 4x median" gate reads this. */
    def drainStraggler(minTasks: Int = 8): Double = stageTasks.synchronized {
      val worst = stageTasks.values
        .filter(_.length >= minTasks)
        .map { ds =>
          val sorted = ds.sorted
          val med = math.max(1L, sorted(sorted.length / 2))
          sorted.last.toDouble / med
        }
      stageTasks.clear()
      if (worst.isEmpty) 1.0 else worst.max
    }
  }

  /** Plant a Zipfian head on a corpus: the same stopword 8× in EVERY
    * document plus a mid-frequency bigram partner in every 3rd — the
    * skew axis every real corpus has (planted after any per-copy
    * rotation, so the stopword's corpus frequency is the FULL corpus
    * size at every factor). */
  private def zipfify(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat_ws(" ", col("text"),
      lit(Seq.fill(8)("zzstop").mkString(" ")),
      when(col("doc_id") % 3 === 0, lit("zzmid zzstop zzmid"))
        .otherwise(lit(""))))

  private def synthesize(spark: SparkSession, base: String, factor: Int,
                         dir: String): Unit = {
    // rotations repeat mod 26: k = 26 would make copy 26 byte-identical
    // to copy 0 (quadratic pair output — the artifact this tool exists
    // to exclude), so cap the factor below the alphabet period
    require(factor >= 1 && factor <= 25,
      s"factor must be in [1, 25] (Caesar period), got $factor")
    val fs = new java.io.File(dir)
    // marker is versioned by synthesis algorithm: a stale corpus from an
    // older synthesis (e.g. the token-tagged variant) must regenerate,
    // not get silently measured under the new method's claims
    if (new java.io.File(fs, "_DONE_caesar_v6").exists()) return
    fs.mkdirs()
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val embs = spark.read.parquet(s"$base/embeddings.parquet")
    // rotate BOTH cases so uppercase letters are not cross-copy fixed
    // points (digits/punctuation remain — testdata text is lowercase
    // words + spaces, and a shared digit shingle would need 5 adjacent
    // non-letter chars to collide at shingleSize=5); the lower/upper
    // rotation stays bijective, preserving intra-copy dup structure
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val upper = alpha.toUpperCase
    val docCopies = (0 until factor).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text", translate(col("text"),
          alpha + upper,
          alpha.drop(k % 26) + alpha.take(k % 26) +
            upper.drop(k % 26) + upper.take(k % 26)))
    }
    docCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until factor).map { k =>
      if (k == 0) embs
      else embs.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // lineitem (graph edges only): shifting BOTH keys by k·10⁷ yields k
    // disjoint graph components — src stays < 2·10⁵ and dst ≥ 10⁶ inside
    // each 10⁷ block, so copies never cross-link and the pagerank
    // workload scales exactly with nodes+edges
    val li = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
    (0 until factor).map { k =>
      if (k == 0) li
      else li.select((col("l_partkey") + lit(k * 10000000L)).as("l_partkey"),
        (col("l_suppkey") + lit(k * 10000000L)).as("l_suppkey"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // events (streaming-family trajectory): id/user shifts keep copies
    // disjoint (per-user sessions and view→purchase pairs never cross
    // copies); ts is UNCHANGED, so k× data = k× traffic over the same
    // time range — the realistic stream-scaling axis (state per window
    // key grows with traffic; watermark advance pattern is identical).
    // Written raw (NTZ passes through), mirroring the driver's physical
    // contract — the streaming runner normalizes via Tables.load.
    val ev = spark.read.parquet(s"$base/events.parquet")
    (0 until factor).map { k =>
      if (k == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(k * 10000000L))
        .withColumn("user_id", col("user_id") + lit(k * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // orders (temporal-join dimension): shift the VERSION id only and keep
    // o_custkey + o_orderdate, so each copy adds another full set of SCD2
    // versions to the SAME keys — the versions-per-key growth axis (the
    // equi-join candidate list per fact grows k×; tied valid_from dates
    // produce zero-width versions that match nothing, exactly as ties do
    // in a real change feed)
    val ord = spark.read.parquet(s"$base/orders.parquet")
    (0 until factor).map { k =>
      if (k == 0) ord
      else ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    new java.io.FileOutputStream(new java.io.File(fs, "_DONE_caesar_v6")).close()
  }

  /** k disjoint id-shifted copies of the base co-purchase projection
    * (parts sharing an order) — the graph rows' component-copies axis.
    * The synthesized lineitem keeps only (l_partkey, l_suppkey), so the
    * orderkey-bearing projection builds from BASE and shifts per copy. */
  private def copurchaseCopies(spark: SparkSession, base: String,
                               factor: Int): DataFrame = {
    val li = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val e0 = li.as("a").join(li.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    (0 until factor).map { k =>
      if (k == 0) e0
      else e0.select((col("src") + lit(k * 10000000L)).as("src"),
        (col("dst") + lit(k * 10000000L)).as("dst"))
    }.reduce(_ unionByName _)
  }

  /** k disjoint id-shifted copies of the base customer⟷part purchase
    * graph (orders carries the custkey; the synthesized lineitem drops
    * l_orderkey, so copies build from BASE like [[copurchaseCopies]]).
    * Customer ids offset by 10⁷ to stay disjoint from part ids; copy
    * stride 10⁸ keeps copies disjoint from each other. */
  private def custPartCopies(spark: SparkSession, base: String,
                             factor: Int): DataFrame = {
    val li = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val o = spark.read.parquet(s"$base/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") + lit(10000000L)).as("src"),
        col("l_partkey").as("dst"))
    (0 until factor).map { k =>
      if (k == 0) e0
      else e0.select((col("src") + lit(k * 100000000L)).as("src"),
        (col("dst") + lit(k * 100000000L)).as("dst"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val synthRoot = if (args.length > 1) args(1) else "target/scalecheck"
    // optional 3rd arg: comma-separated query-name filter (add a new path
    // without re-paying the expensive ones)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // optional 4th arg: comma-separated factor list (probe one axis
    // without re-paying the full 1/3/10 sweep)
    val factors =
      if (args.length > 3) args(3).split(",").toSeq.map(_.toInt)
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)
    // per-invocation id stride for q_ingest_loop_pq (see its comment)
    val pqIngestRep = new AtomicLong(0L)

    // each run gets (synth dir, scale factor): most paths read k×
    // tables from dir; generator-input paths (video) scale off the
    // factor directly
    val allRuns: Seq[(String, (String, Int) => DataFrame)] = Seq(
      // grid-DBSCAN: each synthesized copy shifts +5.0 in x (copies are
      // disjoint blobs), so OCCUPIED CELLS and clusters both grow k× —
      // the spatial-growth axis; a super-linear curve here would flag
      // the cell aggregation or the CC rounds
      ("q_cluster_density", (dir, _) => {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        graft.llm.Density.gridDbscan(
          e.select(col("vec_id"),
            (col("embedding").getItem(0).cast("double") +
              expr("vec_id div 10000000L").cast("double") * lit(5.0))
              .as("x"),
            col("embedding").getItem(1).cast("double").as("y")),
          eps = 0.05, minPts = 12, idCol = "vec_id")
      }),
      // positional postings: Caesar copies share no tokens, so the
      // (term, doc) key space AND token volume grow k× — shuffle must
      // stay exactly linear
      ("q_index_postings", (dir, _) => graft.llm.Retrieval
        .positionalPostings(spark.read.parquet(s"$dir/documents.parquet"))),
      // round-14 (VERDICT r13 #7): TERM SKEW. A Zipfian stopword spans
      // every document (planted AFTER the Caesar rotation, so its
      // corpus frequency is the full k× doc count — the worst skew a
      // real corpus produces). The postings layout keys by (term, DOC),
      // so the stopword's occurrences spread across as many reduce keys
      // as there are documents — no task receives a term-sized group.
      // Gate: shuffle linear in k, straggler_x < 4.
      ("q_index_postings_zipf", (dir, _) => graft.llm.Retrieval
        .positionalPostings(zipfify(
          spark.read.parquet(s"$dir/documents.parquet")))),
      // phrase search over the SKEWED terms themselves: both sides of
      // the adjacency join are the stopword/mid-word postings (corpus-
      // sized term frequency), but the join keys on doc_id with
      // constant per-doc fanout — the lossless-band discipline's skew
      // claim, measured. Same gates.
      ("q_retrieval_phrase_zipf", (dir, _) => graft.llm.Retrieval
        .phraseMatches(zipfify(
          spark.read.parquet(s"$dir/documents.parquet")),
          Seq("zzmid", "zzstop"))),
      ("q_dedup_minhash", (dir, _) => Dedup.minhashLsh(
        spark.read.parquet(s"$dir/documents.parquet"),
        numHashes = 64, bands = 16, shingleSize = 5, maxBucketSize = 500)),
      // full corpus, not the oracle's doc_id<120 slice — the library path
      ("q_dedup_jaccard_prefix", (dir, _) => Dedup.prefixFilteredJaccardPairs(
        spark.read.parquet(s"$dir/documents.parquet"), minJaccard = 0.8)),
      ("q_sim_ivfpq", (dir, _) => {
        val embs = spark.read.parquet(s"$dir/embeddings.parquet")
        Similarity.ivfPqTopK(embs, embs.filter(col("vec_id") < 10),
          k = 5, nlist = 16, nprobe = 4, m = 8, ksub = 16, refine = 4)
      }),
      // the production 100 TB shape: quantizers train on the deterministic
      // hash-band sample, so training cost stays ~flat as the corpus grows
      // while encode/scan stay linear
      ("q_sim_ivfpq_tf0.1", (dir, _) => {
        val embs = spark.read.parquet(s"$dir/embeddings.parquet")
        Similarity.ivfPqTopK(embs, embs.filter(col("vec_id") < 10),
          k = 5, nlist = 16, nprobe = 4, m = 8, ksub = 16, refine = 4,
          trainFraction = 0.1)
      }),
      // the measured-rebuild knob at scale (r15 VERDICT #6): write a k×
      // IVF index, append a drifted tenth of the corpus (+10 every dim
      // — trips the gauge at every factor), then run the actuator with
      // trainFraction = 0.1. Lloyd iterations run on the deterministic
      // hash sample (training ~flat in k) while the re-assignment
      // rewrite — the unavoidable linear pass any rebuild pays — tracks
      // the corpus; the returned row's rebuilt=true and the restored
      // 1e6 anchor are the correctness half (IndexHealthSpec pins the
      // recall story on the straddled twin)
      ("q_ivf_rebuild_tf0.1", (dir, _) => {
        val embs = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val idx = s"$synthRoot/ivf_rebuild_tf_idx"
        Similarity.writeIvfIndex(embs, idx, nlist = 16)
        Similarity.appendToIvfIndex(
          embs.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 1000000000L).as("vec_id"),
              expr("transform(embedding, x -> x + cast(10 as float))")
                .as("embedding")), idx)
        Similarity.rebuildIvfIndexIfDrifted(spark, idx,
          trainFraction = 0.1)
      }),
      // query-level paths (SparkEntry reads documents.parquet from dir):
      // the shingle hash-aggregate span detector and the Bloom-prefiltered
      // decontamination join — the two non-pairwise dedup shapes
      ("q_dedup_spans", (dir, _) =>
        graft.SparkEntry.queries("q_dedup_spans")(spark, dir)),
      ("q_decontaminate_bloom", (dir, _) =>
        graft.SparkEntry.queries("q_decontaminate_bloom")(spark, dir)),
      // round-6 additions: the iterative fixpoint graph sweep (synthesized
      // lineitem = disjoint component copies), the exact label-aware
      // mining path, and the CCNet pair — exact per-language window sort
      // vs the sort-free approx-cutoff production shape, so the trajectory
      // table shows WHY the approx path is spec-pinned
      ("q_graph_pagerank", (dir, _) => graft.llm.Graphs.pagerankExact(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst")),
        iters = 8).orderBy(col("rank").desc, col("node")).limit(100)),
      ("q_sim_hard_negatives", (dir, _) => {
        val embs = spark.read.parquet(s"$dir/embeddings.parquet")
        Similarity.hardNegativesTopK(embs, embs.filter(col("vec_id") < 10),
          k = 5)
      }),
      ("q_ccnet_buckets_exact", (dir, _) =>
        graft.SparkEntry.queries("q_ccnet_buckets")(spark, dir)),
      ("q_ccnet_buckets_approx", (dir, _) => graft.llm.TextAnalysis
        .pplBucketsApprox(spark.read.parquet(s"$dir/documents.parquet"))),
      // round-7 addition: the chained two-stateful-operator streaming
      // query (per-10-min counts → hourly peak) — the heaviest
      // state-store path in the bench. k× traffic over the same time
      // range, so state keys stay constant while per-key updates scale;
      // a super-linear curve here would flag state-store or shuffle
      // pathology the batch rows can't see. (Timed cell includes the
      // one-off heartbeat staging on rep 1; best-of-2 drops it.)
      ("q_stream_chained_agg", (dir, _) =>
        graft.SparkEntry.queries("q_stream_chained_agg")(spark, dir)),
      // round-7: incremental dedup with a FIXED batch against a GROWING
      // history — the claim under test is that the candidate join stays
      // delta-sized while only the (linear, embarrassingly parallel)
      // history signature pass grows. In production the history index is
      // precomputed once; this row pays it per run, so the measured curve
      // is the WORST case for the pattern.
      ("q_dedup_incremental", (dir, _) => Dedup.incrementalMinhashMatches(
        spark.read.parquet(s"$dir/documents.parquet"),
        spark.read.parquet(s"$base/documents.parquet")
          .filter(col("doc_id") >= 400),
        numHashes = 64, bands = 16, shingleSize = 5, maxBucketSize = 500)),
      // round-9: the SAME fixed batch against a PERSISTED history index
      // (staged once per factor OUTSIDE the timing, like the video
      // fixtures) — the production complement of q_dedup_incremental:
      // the measured curve is the true per-batch cost with history
      // signatures never recomputed
      ("q_dedup_incremental_idx", (_, f) =>
        Dedup.incrementalMinhashMatchesIndexed(
          spark.read.parquet(s"$base/documents.parquet")
            .filter(col("doc_id") >= 400),
          s"$synthRoot/mhidx_x$f")),
      // round-9: the streaming front door against a GROWING history
      // index (the headline's heaviest query, q_stream_dedup_indexed's
      // core without the oracle gating): the SAME fixed batch streams
      // against the k× mhidx staging — per-batch cost must stay
      // delta-sized from the stream exactly as it does from the batch
      // reader, with the fixed micro-batch machinery as a constant
      ("q_stream_dedup_idx", (_, f) =>
        graft.streaming.EventStreams.runParquetAvailableNowAppend(
          spark, s"$synthRoot/stream_batch",
          st => Dedup.streamingMinhashMatchesIndexed(
            st, s"$synthRoot/mhidx_x$f"),
          s"sc_stream_dedup_idx_x$f")),
      // round-9: IVF ANN against the PERSISTED index (staged per factor
      // outside the timing): the from-scratch path re-pays centroid
      // training + whole-corpus cell assignment every run; the indexed
      // query pays only its probed cells' postings. At fixed nlist the
      // probed read still grows with the index (nprobe/nlist of k×
      // rows) — the claim is the training/assignment pass is GONE and
      // the remaining curve tracks the probed fraction, never the whole
      // index
      ("q_sim_ivf_idx", (_, f) => graft.llm.Similarity.ivfTopKIndexed(
        spark.read.parquet(s"$base/embeddings.parquet")
          .filter(col("vec_id") < 10),
        s"$synthRoot/ivfidx_x$f", k = 5, nprobe = 4)),
      // round-10: the CLOSED ingest loop's per-batch cost against a
      // growing history index (staged per factor): one foreachBatch
      // body = indexed match (band-pruned, delta-sized) + survivor
      // append (O(batch) keyed file sets) — the curve must stay flat
      // for 10× history. The batch is the base docs REVERSED (novel
      // shingles, novel ids), so rep 1 measures match+append and rep 2
      // (after rep 1's append made the batch historical) match+empty
      // append; min-of-2 is comparable across factors
      ("q_ingest_loop", (_, f) => {
        val batch = spark.read.parquet(s"$base/documents.parquet")
          .filter(col("doc_id") < 500)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            reverse(col("text")).as("text"))
        graft.llm.Dedup.ingestBatchIntoMinhashIndex(batch,
          s"$synthRoot/mhidx_ing_x$f", s"k${System.nanoTime()}",
          threshold = 0.9999)
        spark.range(1).toDF("done")
      }),
      // round-11: the IVF-PQ ingest loop's per-batch cost against a k×
      // history index (same pristine + fresh-copy discipline as
      // q_ingest_loop — the loop mutates its fixture): one foreachBatch
      // body = indexed ADC match + exact re-rank (partition-pruned,
      // delta-sized) + survivor append to BOTH tiers (O(batch) keyed
      // file sets) — the curve must stay flat for 10× history. The
      // batch negates the base vectors (cos −1 vs every history twin →
      // novel), and each invocation offsets the ids by a fresh stride:
      // the ANN match EXCLUDES same-id candidates, so a repeat of the
      // SAME ids would never see its own earlier append and would
      // silently re-append duplicates — with fresh ids the repeat's
      // vectors match their earlier copies by CONTENT (cos 1.0) and
      // drop. Rep 1 thus measures match+append and rep 2 match+empty
      // append; min-of-2 comparable across factors
      ("q_ingest_loop_pq", (_, f) => {
        val stride = pqIngestRep.getAndIncrement()
        val batch = spark.read.parquet(s"$base/embeddings.parquet")
          .filter(col("vec_id") < 500)
          .select((col("vec_id") + 900000000L + stride * 1000000L)
            .as("vec_id"),
            expr("transform(embedding, x -> -x)").as("embedding"))
        graft.llm.Similarity.ingestBatchIntoIvfPqIndex(batch,
          s"$synthRoot/ivfpqidx_ing_x$f", s"k${System.nanoTime()}",
          minCos = 0.999, nprobe = 4)
        spark.range(1).toDF("done")
      }),
      // round-10: IVF-PQ against the PERSISTED two-tier index (staged
      // per factor outside the timing): the ADC scan reads m-int code
      // rows from probed cells only, the re-rank touches raw vectors
      // for k·refine candidates — both tiers partition-pruned, so the
      // curve must stay flat as the index grows 10×
      ("q_sim_ivfpq_idx", (_, f) => graft.llm.Similarity.ivfPqTopKIndexed(
        spark.read.parquet(s"$base/embeddings.parquet")
          .filter(col("vec_id") < 10),
        s"$synthRoot/ivfpqidx_x$f", k = 5, nprobe = 4, refine = 4)),
      // round-9: WARC cracking throughput — k× staged .warc.gz segments
      // (2000 records each, ~700 B/record): gunzip + frame parse + HTTP
      // split are partition-local with one task per segment, so time
      // should track container bytes and shuffle stay at the final
      // aggregate's partials
      ("q_scan_warc", (_, f) => graft.sources.Warc.readResponses(
          spark, s"$synthRoot/warc_x$f")
        .groupBy(col("http_status"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("bytes"))),
      // round-8: suffix-array variable-length dedup — positions (and the
      // md5-bucketed suffix table) grow linearly with the corpus; copies
      // share no word tokens, so buckets never merge across copies and a
      // super-linear curve would expose a hidden pairwise path
      ("q_dedup_suffix", (dir, _) => Dedup.suffixDuplicateSpans(
        spark.read.parquet(s"$dir/documents.parquet"))),
      // round-8: BPE training on the VOCABULARY growth axis — the Caesar
      // copies contribute k× distinct words (every rotated word is new),
      // not just k× rows, so the per-round pair aggregate's input (the
      // word table) genuinely grows k×; training rounds stay fixed at 8
      ("q_bpe_learn", (dir, _) => graft.llm.Tokenization.learnBpeMerges(
        spark.read.parquet(s"$dir/documents.parquet"), "text",
        numMerges = 8)),
      // round-9: BPE training on the MERGE-DEPTH axis (M = 64 and 256 at
      // the same corpus) — the batched rounds claim is that a realistic
      // merge count costs ~one scan per tens of merges, not one driver
      // round-trip per merge; a depth curve near-linear (or better) in M
      // is the evidence, and the factor axis shows depth × vocabulary
      ("q_bpe_learn_m64", (dir, _) => graft.llm.Tokenization.learnBpeMerges(
        spark.read.parquet(s"$dir/documents.parquet"), "text",
        numMerges = 64)),
      ("q_bpe_learn_m256", (dir, _) => graft.llm.Tokenization.learnBpeMerges(
        spark.read.parquet(s"$dir/documents.parquet"), "text",
        numMerges = 256)),
      // round-9: large-star/small-star connected components on a PLANTED
      // LONG-CHAIN graph (diameter = 50k·f — the shape serialized
      // suffix/span dedup emits, and one the O(diameter) propagation
      // loop can never finish inside any sane sweep bound): rounds grow
      // as log(diameter), so time should be near-FLAT in f while bytes
      // track the edge list
      ("q_dedup_cc_chain", (_, f) => Dedup.connectedComponentsStar(
        spark.range(50000L * f)
          .select(col("id").as("d1"), (col("id") + 1).as("d2")))),
      // round-8: temporal join on the VERSIONS-PER-KEY axis — synthesized
      // orders add k full version sets to the SAME dimension keys, so the
      // per-fact candidate list in the equi-join grows k× (the residual
      // time predicate still keeps ≤ 1 match per fact)
      ("q_temporal_join", (dir, _) =>
        graft.SparkEntry.queries("q_temporal_join")(spark, dir)),
      // round-8: video decode throughput — k× synthetic GVID containers
      // staged to parquet OUTSIDE the timed region (the single-threaded
      // driver-side fixture generation would otherwise dominate and read
      // as fake super-linearity), so the curve shows scan + demux +
      // per-frame PNG decode scaling with container bytes
      ("q_multimodal_video", (_, f) => graft.llm.Multimodal
        .sampleVideoFrames(
          spark.read.parquet(s"$synthRoot/videos_x$f/media.parquet"),
          stride = 2)),
      // round-12: MP3 header walk on the container-BYTES axis (k× staged
      // files, same out-of-timing staging rule as video) — the walk is
      // O(file bytes) partition-local scan-and-jump with zero shuffle, so
      // time must track bytes linearly and never the frame count alone
      ("q_multimodal_mp3", (_, f) => graft.llm.Multimodal.mp3Meta(
        spark.read.parquet(s"$synthRoot/mp3_x$f/media.parquet"))),
      // round-8: line-level boilerplate strip — the Caesar copies keep
      // each copy's recurring-line structure intact (rotation is a
      // bijection on line text) while lines never collide across copies,
      // so the per-(source, line-hash) frequency aggregate's group count
      // and the affected-doc output both grow exactly k×
      ("q_boilerplate", (dir, _) => graft.llm.TextAnalysis
        .stripBoilerplate(spark.read.parquet(s"$dir/documents.parquet"))),
      // round-8: bigram LM scoring on the VOCABULARY axis (Caesar copies
      // add k× distinct words AND k× distinct bigrams) — the model
      // tables grow k× while per-doc scoring work stays constant; a
      // super-linear curve would flag the model join degenerating
      ("q_lm_bigram", (dir, _) => graft.llm.TextAnalysis
        .bigramLmScore(spark.read.parquet(s"$dir/documents.parquet"))),
      // round-11: unigram-LM training on the VOCABULARY growth axis —
      // the same axis as q_bpe_learn (Caesar copies add k× distinct
      // words): the word table, the substring-count seed, and each EM
      // round's usage aggregate all grow with the vocabulary, while the
      // number of driver round-trips stays fixed at `iters`; a
      // super-linear curve would flag the per-word Viterbi or the seed
      // explosion degenerating
      ("q_unigram_learn", (dir, _) => graft.llm.Tokenization.learnUnigram(
        spark.read.parquet(s"$dir/documents.parquet"), "text")),
      // round-11: WordPiece training on the same VOCABULARY axis — the
      // likelihood-argmax rounds are sequential by necessity (a fresh
      // merge's low count sits in new scores' denominators), so the
      // claim under test is that each round's two hash aggregates over
      // the k×-vocabulary word table stay cheap against the fixed
      // 8-round driver-sync cost
      ("q_wordpiece_learn", (dir, _) => graft.llm.Tokenization
        .learnWordpieceMerges(
          spark.read.parquet(s"$dir/documents.parquet"), "text",
          numMerges = 8)),
      // round-11: k-means Lloyd training on the DIMENSION axis (fixed
      // 4000 rows, d = 64·f; run with factors "1,4,16" for d=64/256/
      // 1024): above d=128 the update switches to the posexplode +
      // (cluster, dim) hash aggregate, so planner/codegen cost stays
      // flat in d and the curve tracks data volume (n·d elements,
      // linear in f) instead of exploding with thousands of
      // per-dimension aggregate expressions. Vectors synthesize in-plan
      // (a transform over sequence — no staging, no driver loop).
      ("q_kmeans_dim", (_, f) => {
        val d = 64 * f
        val vecs = spark.range(4000).select(col("id").as("vec_id"),
          expr(s"transform(sequence(1, $d), " +
            "j -> cast((id * 31 + j) % 97 AS double) / 97.0)")
            .as("embedding"))
        graft.llm.Clustering.kmeans(vecs, "vec_id", "embedding",
          k = 8, iters = 3)
      }),
      // round-11: the graph trio on the COMPONENT-COPIES axis — k
      // disjoint id-shifted copies of the base co-purchase projection
      // (copies never cross-link, structure identical per copy), so
      // wedge rows, peel work, and vote rows all grow EXACTLY k×; a
      // super-linear time curve would flag the wedge join or the
      // per-round label join degenerating. The k× projection join is
      // part of the timed cell (linear, dominated by the graph work).
      ("q_graph_triangles", (_, f) =>
        graft.llm.Graphs.triangleCounts(copurchaseCopies(spark, base, f))),
      ("q_graph_kcore", (_, f) =>
        graft.llm.Graphs.kcore(copurchaseCopies(spark, base, f),
          k = 80, rounds = 6)),
      ("q_graph_labelprop", (dir, _) => graft.llm.Graphs.labelPropagation(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst")), iters = 4)),
      // round-11: HITS on the k× purchase-graph axis (same synthesized
      // lineitem as pagerank): per sweep each direction is one edge
      // join + one hash aggregate over m′ = k·m distinct edges, so
      // time should track edges linearly with the n-row score tables
      // as the only moving join side
      ("q_graph_hits", (dir, _) => graft.llm.Graphs.hitsExact(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst")), iters = 4)),
      // round-11: link prediction on the COMPONENT-COPIES axis — k
      // disjoint copies of the customer⟷part purchase graph: the hinge
      // cap (deg ≤ 40) bounds per-hinge wedge fan-out, copies never
      // cross-link, so wedge rows (~12M per copy at sf0.1) and pair
      // groups grow EXACTLY k×; a super-linear curve would flag the
      // wedge self-join or the pair aggregate degenerating into an
      // uncapped all-pairs shape
      ("q_graph_linkpred", (_, f) => graft.llm.Graphs.linkPrediction(
        custPartCopies(spark, base, f), maxDeg = 40)
        .orderBy(col("ra_micro").desc, col("cn").desc, col("u"), col("w"))
        .limit(100)),
      // round-11: hash-derandomized walks on the k× purchase-graph axis
      // (same synthesized lineitem as pagerank): per step one
      // frontier⋈edges join over m′ = k·m edges where only the n-row
      // frontier moves + one per-start argmin — time should track
      // edges near-linearly with the frontier as the only moving side
      ("q_graph_walks", (dir, _) => {
        val e0 = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        graft.llm.Graphs.seededWalks(
          e0.unionByName(e0.select(col("dst").as("src"),
            col("src").as("dst"))), steps = 4, seed = 42L)
      }),
      // round-11: hyperlink extraction + resolution throughput on the
      // PAGE-COUNT axis (50k·f in-plan synthesized pages, 5 anchors
      // each covering the absolute/rooted/relative-dotted/scheme-drop/
      // fragment rules): per-row regexp + explode + the codegen'd
      // dot-segment expression, so time must track pages linearly and
      // shuffle stay at the host-pair rollup's partials
      ("q_warc_links_scale", (_, f) => {
        val pages = spark.range(50000L * f).select(
          concat(lit("http://h"), col("id") % 997,
            lit(".example/d/e/"), col("id")).as("url"),
          concat(
            lit("<html><body><a href=\"http://t"), col("id") % 1009,
            lit(".example/x\">t link</a>"),
            lit("<a href='/a/b.html'>rooted</a>"),
            lit("<a href=\"../up/c?q=1&amp;r=2\">up</a>"),
            lit("<a href=\"javascript:void(0)\">j</a>"),
            lit("<a href=\"p#frag\">f</a></body></html>")).as("html"))
        graft.sources.Links.hostEdges(graft.sources.Links.resolved(pages))
      }),
      // round-8: audio fingerprint near-dup — k× staged WAV clips (same
      // out-of-timing staging rule as video); decode + fingerprint is
      // partition-local, and the only exchange is the banded signature
      // table, so time should track clip bytes and shuffle stay tiny
      ("q_dedup_audiofp", (_, f) => Dedup.audioFingerprintPairs(
        spark.read.parquet(s"$synthRoot/audiofp_x$f/media.parquet"),
        maxHamming = 4, maxBucketSize = 500)),
      // round-12: NN-Descent graph BUILD on the k× embeddings axis
      // (id-shifted copies): per round the candidate volume is O(n·K²)
      // with only (src, dst) id pairs in the shuffle (codes join back
      // per distinct pair), so time and shuffle bytes must track the
      // vector count linearly — a super-linear curve would flag the
      // neighbour-of-neighbour join degenerating toward all-pairs
      ("q_sim_nndescent", (dir, _) => graft.llm.GraphAnn.nnDescentGraph(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        k = 16, rounds = 6)),
      // round-12: beam SEARCH against the PERSISTED k-NN-graph index
      // (staged per factor outside the timing — the production shape:
      // the graph is a precomputed artifact): the scored pair count is
      // |queries|·beam·K per step, INDEPENDENT of corpus size; the only
      // residual growth is the broadcast-hash codes lookup scan, so the
      // time curve must stay near-flat and shuffle near-zero while the
      // index grows 10×
      ("q_sim_graph_idx", (_, f) => graft.llm.GraphAnn
        .searchKnnGraphIndexed(
          spark.read.parquet(s"$base/embeddings.parquet")
            .filter(col("vec_id") < 10),
          s"$synthRoot/knngidx_x$f", k = 5, beam = 8, steps = 4)),
      // round-13: ANN margin mining on the corpus axis — BOTH sides grow
      // k× (id-shifted embedding copies) and nlist grows with the corpus
      // (the FAISS sizing rule, nlist ∝ n at fixed cell size): per-cell
      // candidate lists stay ~constant, so the scored-pair volume and
      // shuffle must track the corpus LINEARLY where the exact path's
      // crossJoin grows k² — the sub-quadratic claim under test
      ("q_sim_margin_ann", (dir, f) => {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        Similarity.marginPairsAnn(
          emb.filter(col("label") === 0), emb.filter(col("label") === 1),
          k = 4, topN = 60, nlist = 16 * f, nprobe = 4)
      }),
      // round-13: semantic decontamination on the TRAIN axis — the
      // benchmark side is FIXED (eval suites don't grow with the
      // corpus) and broadcasts, so the pair volume and time must track
      // the k× train side exactly linearly with shuffle at the per-doc
      // rollup's partials only
      ("q_decontaminate_semantic", (dir, _) => {
        val bench = spark.read.parquet(s"$base/embeddings.parquet")
          .filter(col("label") === 0 && col("vec_id") < 100)
          .select("vec_id", "embedding")
        graft.llm.Contamination.semanticContamination(
          spark.read.parquet(s"$dir/embeddings.parquet")
            .filter(col("label") =!= 0).select("vec_id", "embedding"),
          bench, minCosMicro = 9000L)
      }),
      // round-13: WebDataset write+crack roundtrip on the corpus-BYTES
      // axis — unlike the staged-fixture container rows, the WRITE is
      // the operator here: shard framing, the contiguity shuffle, and
      // the block-walk read must all track bytes linearly (shards per
      // run scale with the factor to hold per-shard size constant)
      ("q_webdataset_roundtrip", (dir, f) => {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val members = docs.select(
          concat(lit("d"), col("doc_id")).as("sample_key"),
          lit("txt").as("ext"), col("text").cast("binary").as("data"))
        val out = s"$synthRoot/wds_rt_x$f"
        graft.core.Fs.deleteTree(out)
        graft.sources.WebDataset.writeShards(members, out,
          numShards = 8 * f)
        graft.sources.WebDataset.readSamples(spark, out)
          .groupBy(col("ext"))
          .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("bytes"))
      }),
      // round-13: Avro container roundtrip on the corpus-bytes axis —
      // the third format row next to WARC and WebDataset: deflate-block
      // framing on write and block decode on read are both
      // partition-local, so time tracks bytes and shuffle stays at the
      // final aggregate's partials (files ∝ factor holds per-container
      // size constant)
      // round-13 session-2: index deletion on the index-size axis —
      // write a k× index, delete a FIXED 20-id batch, probe. The claim
      // under test: delete cost = one compaction (one full read+rewrite,
      // linear in index size; the fixed request batch adds nothing)
      ("q_index_delete_mh", (dir, _) => {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val idx = s"$synthRoot/mh_del_sc"
        graft.core.Fs.deleteTree(idx)
        Dedup.writeMinhashIndex(docs, idx, numHashes = 64, bands = 16,
          shingleSize = 5, maxBucketSize = 500)
        Dedup.deleteFromMinhashIndex(spark, idx,
          docs.filter(col("doc_id") < 20).select(col("doc_id")))
        Dedup.incrementalMinhashMatchesIndexed(
          docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
            .select((col("doc_id") + 900000).as("doc_id"), col("text")),
          idx)
      }),
      // round-13 session-2: attribution on the event-traffic axis (k×
      // users over the same time range): purchases AND touches both
      // grow k×, but the band join is per-user so candidates per
      // purchase stay constant — shuffle must be linear
      ("q_events_attribution", (dir, _) =>
        graft.SparkEntry.queries("q_events_attribution")(spark, dir)),
      // round-13 session-2: Arrow IPC roundtrip on the same bytes axis
      // as the Avro row — write is the operator, files ∝ factor
      ("q_scan_arrow_roundtrip", (dir, f) => {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val out = s"$synthRoot/arrow_rt_x$f"
        graft.core.Fs.deleteTree(out)
        graft.sources.ArrowIo.writeArrow(docs, out, numFiles = 8 * f)
        graft.sources.ArrowIo.readArrow(spark, out)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      }),
      ("q_scan_avro_roundtrip", (dir, f) => {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val out = s"$synthRoot/avro_rt_x$f"
        graft.core.Fs.deleteTree(out)
        graft.sources.AvroIo.writeAvro(docs, out, numFiles = 8 * f)
        graft.sources.AvroIo.readAvro(spark, out)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      }),
      // round-12 session-2: paragraph dedup on the corpus axis — the
      // Caesar rotation preserves every intra-copy duplicated paragraph
      // exactly and makes copies disjoint, so output rows, the winner
      // hash aggregate, and the join-back all scale linearly with k
      ("q_dedup_paragraphs", (dir, _) => Dedup.paragraphDedup(
        spark.read.parquet(s"$dir/documents.parquet"))),
      // round-13: FUZZY paragraph dedup on the same corpus axis — the
      // Caesar rotation preserves intra-copy near-dup paragraph
      // structure exactly while copies share no word tokens, so the
      // paragraph signature pass, the banded exchange, and pair output
      // all grow linearly with k; the hot-bucket cap (500) bounds any
      // boilerplate-paragraph clique
      ("q_dedup_paragraphs_fuzzy", (dir, _) => Dedup.paragraphMinhashPairs(
        spark.read.parquet(s"$dir/documents.parquet"),
        maxBucketSize = 500)),
      // entity-resolution on the record-count axis: entities derived
      // from the k× documents table (md5-spread names + a flipped-tail
      // twin per 5th record) — sort + rank, bounded window join,
      // levenshtein verify, CC rounds; candidate volume is n·(w−1) by
      // construction so the whole chain must track n
      ("q_entity_resolution", (dir, _) => {
        val base = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("ent_id"),
            concat(col("source"), lit("-"),
              substring(md5(col("doc_id").cast("string")), 1, 8))
              .as("name"))
        val twin = base.filter(col("ent_id") % 5 === 0)
          .select((col("ent_id") + 1000000000L).as("ent_id"),
            concat(expr("substring(name, 1, length(name) - 1)"), lit("x"))
              .as("name"))
        graft.llm.Linkage.resolveEntities(base.unionByName(twin),
          "ent_id", "name", window = 3, maxDist = 2)
      }),
      // winnowing pairs on the corpus axis: per-row fingerprint
      // selection (zero shuffle), one DISTINCT, the df-capped inverted
      // fingerprint join — candidates bounded by the df cap per key
      ("q_dedup_winnow", (dir, _) => Dedup.winnowPairs(
        spark.read.parquet(s"$dir/documents.parquet"))),
      // CDC chunk dedup on the corpus axis: chunking is codegen'd
      // per-row work; the only exchange is the chunk-hash aggregate
      ("q_dedup_cdc", (dir, _) => Dedup.cdcChunks(
        spark.read.parquet(s"$dir/documents.parquet"))
        .groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("dup_cnt"))
        .filter(col("dup_cnt") > 1)),
      // chrF on the corpus axis: 6 char-gram explosions + the
      // fingerprint-keyed full-outer clip join — the heaviest eval
      // metric; shuffle must track gram rows linearly
      ("q_eval_chrf", (dir, _) => {
        val refs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)"), " ").as("cand"))
        graft.llm.EvalMetrics.corpusChrF(refs, maxN = 6)
      }),
      // TextRank on the vocabulary axis: the Caesar rotation gives each
      // copy a DISJOINT vocabulary, so the co-occurrence graph grows k×
      // in nodes and edges — the pagerank sweeps must keep moving only
      // the n-row state
      ("q_text_textrank", (dir, _) =>
        graft.SparkEntry.queries("q_text_textrank")(spark, dir)),
      // corpus BLEU on the corpus axis: the 4× n-gram explosion and the
      // two (pair, n, gram) hash aggregates are the whole cost — grams
      // shuffle, text does not; everything after the per-n rollup is
      // 1-row arithmetic
      ("q_eval_bleu", (dir, _) => {
        val refs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").as("pair_id"), col("text").as("ref"),
            array_join(expr(
              "filter(filter(split(text, ' '), t -> t != '')," +
                " (t, i) -> (i + 1) % 7 != 0)"), " ").as("cand"))
        graft.llm.EvalMetrics.corpusBleu(refs, maxN = 4)
      }))
    val runs = allRuns.filter { case (name, _) =>
      only.forall(_.contains(name)) }

    // stage the video fixtures (driver-side blob generation — harness
    // cost, not operator cost) before any timing
    if (runs.exists(_._1 == "q_multimodal_video"))
      for (f <- factors) {
        val dir = new java.io.File(s"$synthRoot/videos_x$f")
        if (!new java.io.File(dir, "_DONE").exists()) {
          graft.llm.Multimodal.syntheticVideo(spark, 64 * f)
            .write.mode("overwrite").parquet(s"$dir/media.parquet")
          new java.io.FileOutputStream(new java.io.File(dir, "_DONE")).close()
        }
      }
    if (runs.exists(_._1 == "q_multimodal_mp3"))
      for (f <- factors) {
        val dir = new java.io.File(s"$synthRoot/mp3_x$f")
        if (!new java.io.File(dir, "_DONE").exists()) {
          graft.llm.Multimodal.syntheticMp3(spark, 64 * f)
            .write.mode("overwrite").parquet(s"$dir/media.parquet")
          new java.io.FileOutputStream(new java.io.File(dir, "_DONE")).close()
        }
      }
    if (runs.exists(_._1 == "q_dedup_audiofp"))
      for (f <- factors) {
        val dir = new java.io.File(s"$synthRoot/audiofp_x$f")
        if (!new java.io.File(dir, "_DONE").exists()) {
          graft.llm.Multimodal.syntheticFingerprintAudio(spark, 48 * f)
            .write.mode("overwrite").parquet(s"$dir/media.parquet")
          new java.io.FileOutputStream(new java.io.File(dir, "_DONE")).close()
        }
      }
    if (runs.exists(_._1 == "q_stream_dedup_idx")) {
      val bdir = new java.io.File(s"$synthRoot/stream_batch")
      if (!new java.io.File(bdir, "_DONE").exists()) {
        spark.read.parquet(s"$base/documents.parquet")
          .filter(col("doc_id") >= 400)
          .write.mode("overwrite").parquet(bdir.toString)
        new java.io.FileOutputStream(new java.io.File(bdir, "_DONE")).close()
      }
    }
    if (runs.exists(r => r._1 == "q_dedup_incremental_idx" ||
        r._1 == "q_stream_dedup_idx"))
      for (f <- factors) {
        val src = if (f == 1) base else s"$synthRoot/x$f"
        if (f != 1) synthesize(spark, base, f, src)
        val ix = new java.io.File(s"$synthRoot/mhidx_x$f")
        if (!new java.io.File(ix, "_DONE").exists()) {
          Dedup.writeMinhashIndex(
            spark.read.parquet(s"$src/documents.parquet"), ix.toString,
            numHashes = 64, bands = 16, shingleSize = 5, maxBucketSize = 500)
          Caches.release(); spark.catalog.clearCache()
          new java.io.FileOutputStream(new java.io.File(ix, "_DONE")).close()
        }
      }

    // dedicated staging for the ingest-loop row: the loop APPENDS, so
    // it can share neither the read-only rows' mhidx staging nor a
    // _DONE-cached copy of its own (a mutated fixture would measure a
    // different operation next run and creep its band-dir file counts).
    // A PRISTINE index builds once behind the marker; each RUN works on
    // a fresh file copy of it.
    if (runs.exists(_._1 == "q_ingest_loop"))
      for (f <- factors) {
        val src = if (f == 1) base else s"$synthRoot/x$f"
        if (f != 1) synthesize(spark, base, f, src)
        val pristine = new java.io.File(s"$synthRoot/mhidx_ingp_x$f")
        if (!new java.io.File(pristine, "_DONE").exists()) {
          Dedup.writeMinhashIndex(
            spark.read.parquet(s"$src/documents.parquet"),
            pristine.toString,
            numHashes = 64, bands = 16, shingleSize = 5, maxBucketSize = 500)
          Caches.release(); spark.catalog.clearCache()
          new java.io.FileOutputStream(
            new java.io.File(pristine, "_DONE")).close()
        }
        val run = s"$synthRoot/mhidx_ing_x$f"
        graft.core.Fs.deleteTree(run)
        graft.core.Fs.copyTree(pristine.toString, run)
      }

    if (runs.exists(_._1 == "q_sim_ivf_idx"))
      for (f <- factors) {
        val src = if (f == 1) base else s"$synthRoot/x$f"
        if (f != 1) synthesize(spark, base, f, src)
        val ix = new java.io.File(s"$synthRoot/ivfidx_x$f")
        if (!new java.io.File(ix, "_DONE").exists()) {
          graft.llm.Similarity.writeIvfIndex(
            spark.read.parquet(s"$src/embeddings.parquet"), ix.toString,
            nlist = 16)
          Caches.release(); spark.catalog.clearCache()
          new java.io.FileOutputStream(new java.io.File(ix, "_DONE")).close()
        }
      }
    if (runs.exists(_._1 == "q_sim_ivfpq_idx"))
      for (f <- factors) {
        val src = if (f == 1) base else s"$synthRoot/x$f"
        if (f != 1) synthesize(spark, base, f, src)
        val ix = new java.io.File(s"$synthRoot/ivfpqidx_x$f")
        if (!new java.io.File(ix, "_DONE").exists()) {
          graft.llm.Similarity.writeIvfPqIndex(
            spark.read.parquet(s"$src/embeddings.parquet"), ix.toString,
            nlist = 16, m = 8, ksub = 16)
          Caches.release(); spark.catalog.clearCache()
          new java.io.FileOutputStream(new java.io.File(ix, "_DONE")).close()
        }
      }
    if (runs.exists(_._1 == "q_sim_graph_idx"))
      for (f <- factors) {
        val src = if (f == 1) base else s"$synthRoot/x$f"
        if (f != 1) synthesize(spark, base, f, src)
        val ix = new java.io.File(s"$synthRoot/knngidx_x$f")
        if (!new java.io.File(ix, "_DONE").exists()) {
          graft.llm.GraphAnn.writeKnnGraphIndex(
            spark.read.parquet(s"$src/embeddings.parquet"), ix.toString,
            k = 16, rounds = 6)
          Caches.release(); spark.catalog.clearCache()
          new java.io.FileOutputStream(new java.io.File(ix, "_DONE")).close()
        }
      }
    // PQ ingest-loop staging: pristine two-tier index per factor behind
    // the marker; each RUN works in a fresh file copy (the loop appends)
    if (runs.exists(_._1 == "q_ingest_loop_pq"))
      for (f <- factors) {
        val src = if (f == 1) base else s"$synthRoot/x$f"
        if (f != 1) synthesize(spark, base, f, src)
        val pristine = new java.io.File(s"$synthRoot/ivfpqidx_ingp_x$f")
        if (!new java.io.File(pristine, "_DONE").exists()) {
          graft.llm.Similarity.writeIvfPqIndex(
            spark.read.parquet(s"$src/embeddings.parquet"),
            pristine.toString, nlist = 16, m = 8, ksub = 16)
          Caches.release(); spark.catalog.clearCache()
          new java.io.FileOutputStream(
            new java.io.File(pristine, "_DONE")).close()
        }
        val run = s"$synthRoot/ivfpqidx_ing_x$f"
        graft.core.Fs.deleteTree(run)
        graft.core.Fs.copyTree(pristine.toString, run)
      }

    if (runs.exists(_._1 == "q_scan_warc"))
      for (f <- factors) {
        val dir = new java.io.File(s"$synthRoot/warc_x$f")
        if (!new java.io.File(dir, "_DONE").exists()) {
          graft.sources.Warc.writeSyntheticSegments(
            dir.toString, 30000 * f)
          new java.io.FileOutputStream(new java.io.File(dir, "_DONE")).close()
        }
      }

    // untimed warmup: pays JVM/codegen compilation once, outside every
    // measurement (the first-ever run of each path is 3-10× its steady
    // state and would masquerade as a scaling anomaly at factor 1)
    for ((_, mk) <- runs) {
      mk(base, 1).write.format("noop").mode("overwrite").save()
      Caches.release(); spark.catalog.clearCache()
    }

    for (f <- factors) {
      val dir = if (f == 1) base else s"$synthRoot/x$f"
      if (f != 1) synthesize(spark, base, f, dir)
      for ((name, mk) <- runs) {
        // best-of-2: shuffle bytes are plan-determined (identical across
        // reps); the min wall time drops GC/scheduling transients
        val reps = (1 to 2).map { _ =>
          // the listener bus is async: flush queued stage-completed events
          // before each counter read or late bytes bleed into the next
          // (query, factor) cell — exactly the cross-cell noise a
          // trajectory check cannot tolerate
          def drained(c: AtomicLong): Long = {
            org.apache.spark.graftshim.GraftSparkInternals
              .drainListenerBus(spark.sparkContext)
            c.get()
          }
          // reps must each pay BPE training — a memo hit would measure
          // the cost of not training (same rule as graft.Bench)
          graft.llm.Tokenization.invalidateTrained()
          val w0 = drained(listener.write); val r0 = listener.read.get()
          listener.drainStraggler() // reset the per-stage task window
          val t0 = System.nanoTime()
          mk(dir, f).write.format("noop").mode("overwrite").save()
          val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
          Caches.release()
          spark.catalog.clearCache()
          val w1 = drained(listener.write)
          (sec, w1 - w0, listener.read.get() - r0,
            listener.drainStraggler())
        }
        val best = reps.minBy(_._1)
        val mb = (b: Long) => math.rint(b / 1e5) / 10.0
        println(s"""{"query":"$name","factor":$f,"sec":${best._1},""" +
          s""""shuffle_write_mb":${mb(best._2)},""" +
          s""""shuffle_read_mb":${mb(best._3)},""" +
          s""""straggler_x":${math.rint(best._4 * 10) / 10}}""")
      }
    }
    spark.stop()
  }
}
