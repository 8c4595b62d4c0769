package graft.llm

import graft.SparkSpec

/** Ground truth for the round-12 session-2 curation tier: paragraph-level
  * dedup (Dolma keep-first semantics, hand-unrolled). */
class CurationSpec extends SparkSpec {

  test("paragraphDedup: duplicated paragraphs survive only at their " +
    "minimum (doc_id, pos) occurrence; docs rebuild in position order") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "a b c d a b"), // paras: "a b" | "c d" | "a b" (self-dup)
      (2L, "c d x"),       // paras: "c d" (loses to doc 1) | "x"
      (3L, "a b"))         // single para, all lost -> empty rebuild
      .toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, paraTokens = 2)
      .orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 3L, 2L, "a b c d"),
      (2L, 2L, 1L, "x"),
      (3L, 1L, 0L, "")))
  }

  test("paragraphDedup: short tail paragraph kept; whitespace-only doc " +
    "yields one empty paragraph (not zero rows)") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "p q r"), (2L, " ")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, paraTokens = 2)
      .orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 2L, 2L, "p q r"),
      (2L, 1L, 1L, "")))
  }

  test("paragraphMinhashPairs: near-verbatim paragraphs pair across " +
    "docs, exact copies at est 1.0, unrelated text stays unpaired") {
    import SparkSpec.spark.implicits._
    val base = (0 until 20).map(j => s"tok$j").mkString(" ")
    val near = ((0 until 20).map(j => s"tok$j")
      .updated(7, "CHANGED")).mkString(" ")
    val docs = Seq(
      (1L, base),                      // para (1, 0)
      (2L, s"$near"),                  // one token differs -> near-dup
      (3L, s"zz yy xx ww vv uu"),      // unrelated
      (4L, (0 until 20).map(j => s"fill$j").mkString(" ") + " " + base))
      .toDF("doc_id", "text")
    // doc 4: 20 filler tokens then the EXACT base paragraph at pos 1
    // (the cross-doc verbatim case document-level MinHash dilutes away)
    val got = Dedup.paragraphMinhashPairs(docs, paraTokens = 20,
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
        r.getDouble(4))).toMap
    // exact copy: doc 1 para 0 == doc 4 para 1
    assert(got((1L, 0L, 4L, 1L)) === 1.0)
    // near-dup (1 of 20 tokens changed): high but sub-1.0 estimate
    val nd = got((1L, 0L, 2L, 0L))
    assert(nd >= 0.5 && nd < 1.0, s"near-dup estimate $nd")
    // unrelated doc 3 never appears
    assert(!got.keys.exists(k => k._1 == 3L || k._3 == 3L))
  }

  test("paragraphMinhashPairs: empty tail paragraphs drop before " +
    "signatures — whitespace-only docs pair with nothing") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, " "), (2L, "  "), (3L, "a b c"))
      .toDF("doc_id", "text")
    assert(Dedup.paragraphMinhashPairs(docs, paraTokens = 2,
      minJaccard = 0.0).collect().isEmpty)
  }

  test("kAnonymity: class sizes and the k verdict") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"), ("us", "b"),
      ("fr", "a"), ("fr", "a"))
      .toDF("country", "seg")
    val got = Privacy.kAnonymity(df, Seq("country", "seg"), k = 2)
      .orderBy("country", "seg")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getBoolean(3)))
    assert(got === Array(
      ("fr", "a", 2L, true),
      ("us", "a", 3L, true),
      ("us", "b", 1L, false)))
  }

  test("lDiversity: a k-anonymous class with collapsed sensitive values " +
    "fails the l bar") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // class (us): 3 rows but only ONE sensitive value -> not 2-diverse
      ("us", 5L), ("us", 5L), ("us", 5L),
      // class (fr): 2 rows, 2 distinct values -> 2-diverse
      ("fr", 1L), ("fr", 2L))
      .toDF("country", "sens")
    val got = Privacy.lDiversity(df, Seq("country"), col("sens"), l = 2)
      .orderBy("country")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getBoolean(3)))
    assert(got === Array(
      ("fr", 2L, 2L, true),
      ("us", 3L, 1L, false)))
  }

  test("generalizeToK: first satisfying rung wins; exhausted ladder " +
    "falls through to the last rung") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(("us", "a"), ("us", "b"), ("fr", "a"), ("fr", "a"))
      .toDF("country", "seg")
    val ladder = Seq(
      Seq("qc" -> col("country"), "qs" -> col("seg")), // min class 1
      Seq("qc" -> col("country"), "qs" -> lit("*")),   // min class 2
      Seq("qc" -> lit("*"), "qs" -> lit("*")))         // all 4
    val atK2 = Privacy.generalizeToK(df, ladder, k = 2)
      .orderBy("qc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(atK2 === Array(("fr", "*", 2L, 1L), ("us", "*", 2L, 1L)))
    val atK9 = Privacy.generalizeToK(df, ladder, k = 9)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(atK9 === Array(("*", 4L, 2L))) // nothing reaches 9 -> last rung
    // empty input: min(class_size) is null at every rung — no rung is
    // satisfied, the walk falls through to the terminal rung and returns
    // zero classes instead of NPE-ing on the null minimum
    val empty = Privacy.generalizeToK(df.filter(lit(false)), ladder, k = 2)
    assert(empty.collect().isEmpty)
  }

  test("sortedNeighborhoodPairs: only rows within the rank window " +
    "compare, and the edit-distance bar filters") {
    import SparkSpec.spark.implicits._
    // sorted key order: aaaa(1) aaab(2) aaac(4) zzzz(3)
    val recs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "zzzz"), (4L, "aaac"))
      .toDF("ent_id", "name")
    val w2 = Linkage.sortedNeighborhoodPairs(recs, "ent_id", "name",
        window = 2, maxDist = 1)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // adjacent pairs only; (aaac, zzzz) dist 4 drops
    assert(w2 === Array((1L, 2L, 1), (2L, 4L, 1)))
    val w3 = Linkage.sortedNeighborhoodPairs(recs, "ent_id", "name",
        window = 3, maxDist = 1)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // window 3 additionally reaches (aaaa, aaac)
    assert(w3 === Array((1L, 2L, 1), (1L, 4L, 1), (2L, 4L, 1)))
  }

  test("corpusBleu: hand-computed clipped precisions, brevity penalty, " +
    "and fixed-point geometric mean (maxN = 2)") {
    import SparkSpec.spark.implicits._
    // ref "the cat sat on the mat" (6), cand "the cat on the mat" (5):
    // p1 = 5/5 (clip holds "the" at 2), p2 = 3/4 ("cat on" misses);
    // l1 = 0, l2 = -2877; lbar = (0 - 2877 + 400000) div 2 - 200000
    //    = -1439; bp = exp(1 - 6/5) = 0.8187 -> 8187;
    // bleu = 0.81873 * exp(-0.1439) = 0.70900 -> 7090
    val pairs = Seq((1L, "the cat sat on the mat", "the cat on the mat"))
      .toDF("pair_id", "ref", "cand")
    val r = EvalMetrics.corpusBleu(pairs, maxN = 2).collect().head
    assert(r.getAs[Long]("match_1") === 5L)
    assert(r.getAs[Long]("total_1") === 5L)
    assert(r.getAs[Long]("match_2") === 3L)
    assert(r.getAs[Long]("total_2") === 4L)
    assert(r.getAs[Long]("r_len") === 6L)
    assert(r.getAs[Long]("c_len") === 5L)
    assert(r.getAs[Long]("bp_micro") === 8187L)
    assert(r.getAs[Long]("bleu_micro") === 7090L)
  }

  test("corpusBleu: any zero n-gram precision zeroes the score (the " +
    "unsmoothed convention), and a long candidate gets bp = 1") {
    import SparkSpec.spark.implicits._
    // cand shares unigrams but no bigram; cand longer than ref
    val pairs = Seq((1L, "a b", "b x a")).toDF("pair_id", "ref", "cand")
    val r = EvalMetrics.corpusBleu(pairs, maxN = 2).collect().head
    assert(r.getAs[Long]("match_2") === 0L)
    assert(r.getAs[Long]("bp_micro") === 10000L)
    assert(r.getAs[Long]("bleu_micro") === 0L)
  }

  test("tokenF1: clipped multiset overlap; precision, recall, and F1 " +
    "in exact micro-units") {
    import SparkSpec.spark.implicits._
    // ref "a b a c": counts a2 b1 c1; cand "a a a b": a3 b1
    // overlap = min(3,2) + min(1,1) = 3; p = r = 750000; f1 = 750000
    val pairs = Seq(
      (1L, "a b a c", "a a a b"),
      (2L, "x y", "z z")) // zero overlap -> all zeros
      .toDF("pair_id", "ref", "cand")
    val got = EvalMetrics.tokenF1(pairs).orderBy("pair_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(got === Array(
      (1L, 3L, 750000L, 750000L, 750000L),
      (2L, 0L, 0L, 0L, 0L)))
  }

  test("corpusRougeN: recall-oriented clipped n-gram overlap per n") {
    import SparkSpec.spark.implicits._
    // ref "a b c d" vs cand "a b d":
    // n=1: clip 3 of 4 ref grams -> 750000
    // n=2: only "a b" matches of 3 ref bigrams -> 333333 (floor)
    val pairs = Seq((1L, "a b c d", "a b d")).toDF("pair_id", "ref", "cand")
    val got = EvalMetrics.corpusRougeN(pairs, maxN = 2).orderBy("n")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got === Array((1, 3L, 4L, 750000L), (2, 1L, 3L, 333333L)))
  }

  test("winnowFingerprints: the w+k-1 guarantee, 2/(w+1) density bound, " +
    "and the short-document edges") {
    import SparkSpec.spark.implicits._
    val base = (1 to 20).map(i => s"w$i").mkString(" ") // 20 distinct toks
    val shifted = "p1 p2 p3 " + (6 to 14).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),      // 18 grams (k=3), 15 windows (w=4)
      (2L, shifted),   // contains base's w6..w14 run, at a SHIFTED offset
      (3L, "x y"),     // shorter than k: no grams, no fingerprints
      (4L, "x y z q")) // 2 grams < w hashes: ONE window over what exists
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: doc 2 shares doc 1's run of length 9 = w + k + 2 > w+k-1
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "shared run must yield a shared fingerprint despite the shift")
    // density: can never keep more fingerprints than windows
    assert(byDoc(1L).size <= 15)
    // short-document edges
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).size === 1)
  }

  test("winnowPairs: near-dup docs pair via shared fingerprints; " +
    "disjoint-vocabulary docs never do") {
    import SparkSpec.spark.implicits._
    val run = (1 to 15).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, run + " a1 a2"),
      (2L, "b1 b2 " + run), // shares the 15-token run with doc 1
      (3L, (1 to 15).map(i => s"z$i").mkString(" "))) // disjoint vocab
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, k = 3, window = 4,
        minShared = 2, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs === Array((1L, 2L)))
  }

  test("cdcChunks: chunks tile the document; boundaries are content-" +
    "defined so a prefix insertion re-synchronizes interior chunks") {
    import SparkSpec.spark.implicits._
    val body = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "ins1 ins2 ins3 " + body), // prefix shifts every fixed block
      (3L, "a b"))                    // shorter than k: one whole chunk
      .toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(4)))
    // chunks tile: per-doc token counts sum to the doc length, indexes
    // contiguous from 1
    val d1 = ch.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).sum === 60L)
    assert(d1.map(_._2).toSeq === (1L to d1.length))
    // re-synchronization: docs 1 and 2 share interior chunk hashes even
    // though every FIXED-offset block differs (the published CDC point)
    val h1 = ch.filter(_._1 == 1L).map(_._4).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._4).toSet
    assert((h1 intersect h2).nonEmpty,
      "content-defined boundaries must survive a prefix insertion")
    // short doc: one chunk, the whole text
    val d3 = ch.filter(_._1 == 3L)
    assert(d3.length === 1 && d3.head._3 === 2L)
  }

  test("lcsLen: order-sensitive alignment — scrambles, repeats, " +
    "subsequences, and disjoint/empty inputs") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.functions.{filter => afilter, split, col}
    import graft.functions.TextExpressions
    val cases = Seq(
      ("a b c d e", "b a d c e", 3L), // scrambled: best chains len 3
      ("x y x y", "y x y x", 3L),     // repeats: overlap shifts by one
      ("a b c", "a b c", 3L),         // identity
      ("a b c d", "b d", 2L),         // subsequence: LCS = |cand|
      ("p q r", "s t", 0L),           // disjoint
      ("a b", "", 0L))                // empty side
      .toDF("ref", "cand", "want")
    def toks(c: String) = afilter(split(col(c), " "), t => t =!= "")
    val got = cases.select(
      TextExpressions.lcsLen(toks("ref"), toks("cand")).as("lcs"),
      col("want")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("rougeL: per-pair P/R/F micro-units off the LCS kernel") {
    import SparkSpec.spark.implicits._
    // ref "a b c d" (4) vs cand "b d x" (3): LCS 2
    // r = 2e6 div 4 = 500000; p = 2e6 div 3 = 666666
    // f = 2*500000*666666 div 1166666 = 571428
    val pairs = Seq((1L, "a b c d", "b d x")).toDF("pair_id", "ref", "cand")
    val r = EvalMetrics.rougeL(pairs).collect().head
    assert(r.getAs[Long]("lcs") === 2L)
    assert(r.getAs[Long]("r_micro") === 500000L)
    assert(r.getAs[Long]("p_micro") === 666666L)
    assert(r.getAs[Long]("f_micro") ===
      2L * 500000L * 666666L / (500000L + 666666L))
  }

  test("luhnScan: canonical test PANs verify, an off-by-one check digit " +
    "fails, and short digit runs are not candidates") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),   // classic Visa test PAN: valid
      (2L, "pay 4111111111111112 now"),   // corrupted check digit
      (3L, "visa13 4222222222222 ok"),    // 13-digit test PAN: valid
      (4L, "order 123456789012 done"))    // 12 digits: below the scan floor
      .toDF("doc_id", "text")
    val got = TextAnalysis.luhnScan(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got === Array(
      (1L, "4111111111111111", true),
      (2L, "4111111111111112", false),
      (3L, "4222222222222", true)))
    // a 20+-digit run (hash, order id) is NOT a card candidate: the
    // digit-boundary lookarounds must reject it outright, not slice a
    // 19-digit prefix that could pass the checksum by chance
    val long = Seq((9L, "ref 41111111111111110000 x"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.luhnScan(long).collect().isEmpty)
  }

  test("resolveEntities: matched records collapse to the minimum member " +
    "id; singletons keep their own id") {
    import SparkSpec.spark.implicits._
    val recs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "zzzz"), (4L, "aaac"))
      .toDF("ent_id", "name")
    val got = Linkage.resolveEntities(recs, "ent_id", "name",
        window = 3, maxDist = 1)
      .orderBy("ent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array((1L, 1L), (2L, 1L), (3L, 3L), (4L, 1L)))
  }
}
