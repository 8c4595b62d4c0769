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
    * are two hash aggregates keyed by (pair, n, gram) — only grams
    * shuffle, never document text; everything after the per-n rollup is
    * 1-row arithmetic. No windows, no driver state.
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
          .groupBy(col("pid"), col("n"), col("g"))
          .agg(count(lit(1)).as(out))
      }.reduce(_ unionByName _)

    val cc = counted("ct", "ccnt")
    val rc = counted("rt", "rcnt")
    val perN = cc.join(rc, Seq("pid", "n", "g"), "left")
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
}
