package graft.queries

import org.apache.spark.sql.functions._

/** Mergeable-sketch analytics (Apache DataSketches via Spark 4 builtins):
  * the pre-aggregate-once / merge-at-query-time pattern that replaces
  * re-scanning raw data at 100 TB. Sketches are built per partition/group
  * with one partial→final aggregate, stored as binary columns, and later
  * UNIONED/INTERSECTED without touching the raw rows again — re-aggregation
  * a plain `countDistinct`/`percentile` can never do.
  *
  * Oracle discipline: sketch ESTIMATES are not reproducible in DuckDB's
  * approx functions, so none are emitted raw. Instead each query verifies
  * its sketch's published contract IN-PLAN against the exact answer
  * (error bound, no-undercount, rank window) and emits the exact values
  * plus the contract booleans — the oracle recomputes the exacts and
  * matches literal TRUEs, so a drifting sketch fails the hash compare.
  * SketchesSpec additionally pins merge-consistency identities
  * (merged == direct) and numeric error bounds.
  */
object SketchQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Re-aggregatable distinct counts: one HLL sketch per order status,
    // PLUS the global sketch obtained by merging the group sketches
    // (hll_union_agg) — not by re-scanning orders. The register-max merge
    // is lossless (SketchesSpec pins merged == direct); here each
    // estimate is gated within 5% of the exact distinct count (default
    // lgK=12 → rsd ≈ 1.6%, so 5% ≈ 3 standard errors).
    QueryDef(
      "q_sketch_hll_union",
      (s, dir) => {
        val sk = load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
            countDistinct(col("o_custkey")).as("exact_customers"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val perGroup = sk.select(col("o_orderstatus").as("scope"),
          col("exact_customers"),
          hll_sketch_estimate(col("sk")).as("est"))
        val merged = sk.agg(hll_union_agg(col("sk")).as("u"))
          .crossJoin(broadcast(load(s, dir, "orders")
            .agg(countDistinct(col("o_custkey")).as("exact_customers"))))
          .select(lit("ALL").as("scope"), col("exact_customers"),
            hll_sketch_estimate(col("u")).as("est"))
        perGroup.unionByName(merged)
          .select(col("scope"), col("exact_customers"),
            (abs(col("est") - col("exact_customers")) <=
              col("exact_customers") * lit(0.05)).as("within_5pct"))
          .orderBy(col("scope"))
      },
      Some("""SELECT o_orderstatus AS scope,
             |  count(DISTINCT o_custkey) AS exact_customers,
             |  true AS within_5pct
             |FROM orders GROUP BY o_orderstatus
             |UNION ALL
             |SELECT 'ALL', count(DISTINCT o_custkey), true FROM orders
             |ORDER BY scope""".stripMargin)),

    // Sketch set algebra: the customers active in 1997, in 1998, in both,
    // and in exactly one year — WITHOUT any join or re-scan: two theta
    // sketches, then union/intersection/difference on the sketches
    // themselves. The no-join audience-overlap query every corpus/usage
    // dashboard runs. Gate: each estimate within max(2%, 2) of the exact
    // answer (at sf0.01 cardinalities theta sits in exact mode, so the
    // true error is 0; the slack keeps the gate honest if k is ever
    // lowered). Exacts come from one per-customer flag aggregate.
    QueryDef(
      "q_sketch_theta_overlap",
      (s, dir) => {
        val o = load(s, dir, "orders")
        def yearSketch(y: Int) =
          o.filter(year(col("o_orderdate")) === y)
            .agg(theta_sketch_agg(col("o_custkey")).as("sk"))
        val flags = o.groupBy(col("o_custkey"))
          .agg(max(when(year(col("o_orderdate")) === 1997, 1).otherwise(0))
            .as("in97"),
            max(when(year(col("o_orderdate")) === 1998, 1).otherwise(0))
              .as("in98"))
        val exact = flags.agg(
          sum(col("in97")).as("y1997"),
          sum(col("in98")).as("y1998"),
          sum(greatest(col("in97"), col("in98"))).as("either"),
          sum(col("in97") * col("in98")).as("both_years"),
          sum(col("in97") * (lit(1) - col("in98"))).as("only_1997"))
        val ests = yearSketch(1997).crossJoin(
            yearSketch(1998).withColumnRenamed("sk", "sk2"))
          .select(
            theta_sketch_estimate(col("sk")).as("e1"),
            theta_sketch_estimate(col("sk2")).as("e2"),
            theta_sketch_estimate(theta_union(col("sk"), col("sk2")))
              .as("eu"),
            theta_sketch_estimate(theta_intersection(col("sk"), col("sk2")))
              .as("ei"),
            theta_sketch_estimate(theta_difference(col("sk"), col("sk2")))
              .as("ed"))
        def ok(est: String, ex: String) =
          (abs(col(est) - col(ex)) <=
            greatest(col(ex) * lit(0.02), lit(2.0))).as(s"ok_$ex")
        exact.crossJoin(ests).select(
          col("y1997"), col("y1998"), col("either"), col("both_years"),
          col("only_1997"),
          ok("e1", "y1997"), ok("e2", "y1998"), ok("eu", "either"),
          ok("ei", "both_years"), ok("ed", "only_1997"))
      },
      Some("""WITH f AS (
             |  SELECT o_custkey,
             |    max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END)
             |      AS in97,
             |    max(CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END)
             |      AS in98
             |  FROM orders GROUP BY o_custkey)
             |SELECT CAST(sum(in97) AS BIGINT) AS y1997,
             |  CAST(sum(in98) AS BIGINT) AS y1998,
             |  CAST(sum(greatest(in97, in98)) AS BIGINT) AS either,
             |  CAST(sum(in97 * in98) AS BIGINT) AS both_years,
             |  CAST(sum(in97 * (1 - in98)) AS BIGINT) AS only_1997,
             |  true AS ok_y1997, true AS ok_y1998, true AS ok_either,
             |  true AS ok_both_years, true AS ok_only_1997
             |FROM f""".stripMargin)),

    // Count-min frequency sketch: ONE distributed typed aggregate builds a
    // CMS over every corpus bigram (only the ~KB sketch reaches the
    // driver), then the exact top-20 heavy hitters are probed against it.
    // Gate per row: CMS never undercounts (est >= exact, a hard
    // guarantee) and overshoots by ≤ eps·N (eps = 1e-4, N = total bigram
    // occurrences; holds with prob 0.99 per probe at the fixed seed, and
    // deterministically rerun-stable). The probe uses UTF-8 bytes to
    // match the aggregate's binary update path.
    QueryDef(
      "q_sketch_cms_topk",
      (s, dir) => {
        val words = split(col("text"), " ")
        val grams = when(size(words) >= 2,
            transform(sequence(lit(1), size(words) - 1),
              i => concat_ws(" ", element_at(words, i), element_at(words, i + 1))))
          .otherwise(array())
        // consumed three times (sketch build + exact counts + N): persist;
        // the query driver releases the cache between queries
        val stream = load(s, dir, "documents").select(explode(grams).as("g"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bytes = stream
          .agg(expr("count_min_sketch(g, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("cms"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
        val n = stream.count()
        // the eps·N overcount bound holds with prob 0.99 PER PROBE; over
        // 20 probes the union bound leaves ~18% slack-exceed risk, so the
        // gate uses 3× the single-probe budget (still a real gate — a
        // broken sketch overshoots by orders of magnitude, not 3×)
        val budget = 3L * math.ceil(1e-4 * n).toLong
        val top = stream.groupBy(col("g")).agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("g")).limit(20)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val spark = s
        import spark.implicits._
        top.toSeq.map { case (g, exact) =>
          val est = cms.estimateCount(
            g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (g, exact, est >= exact, est <= exact + budget)
        }.toDF("ngram", "exact_cnt", "no_undercount", "overshoot_ok")
          .orderBy(col("exact_cnt").desc, col("ngram"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |g AS (
             |  SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]
             |    AS ngram
             |  FROM w, unnest(generate_series(1, len(ws) - 1)) AS u(i)
             |  WHERE len(ws) >= 2)
             |SELECT ngram, count(*) AS exact_cnt,
             |  true AS no_undercount, true AS overshoot_ok
             |FROM g GROUP BY ngram
             |ORDER BY exact_cnt DESC, ngram LIMIT 20""".stripMargin)),

    // Mergeable quantiles: per-status KLL sketches of o_totalprice merged
    // into one, then median/p90 read off the MERGED sketch — the shape
    // that lets 1000 ingest jobs each ship a KB-sized sketch instead of
    // re-sorting 100 TB for a global percentile. Gate: the value read off
    // the merged sketch has true rank within 3% of the target over the
    // F∪O subset (default k=200 → ~1.65% normalized rank error, merge
    // preserves the bound), checked by re-joining the quantiles against
    // the data — same rank-contract pattern as q_approx_quantile.
    QueryDef(
      "q_sketch_kll_quantiles",
      (s, dir) => {
        val o = load(s, dir, "orders")
          .filter(col("o_orderstatus").isin("F", "O"))
        def statusSketch(st: String, as: String) =
          o.filter(col("o_orderstatus") === st)
            .agg(kll_sketch_agg_double(col("o_totalprice")).as(as))
        val qs = statusSketch("F", "sk_f").crossJoin(statusSketch("O", "sk_o"))
          .select(kll_sketch_merge_double(col("sk_f"), col("sk_o")).as("m"))
          .select(
            kll_sketch_get_quantile_double(col("m"), lit(0.5)).as("p50"),
            kll_sketch_get_quantile_double(col("m"), lit(0.9)).as("p90"))
        def rankOk(q: Double, v: String) = {
          val le = sum(when(col("o_totalprice") <= col(v), 1L).otherwise(0L))
          val lt = sum(when(col("o_totalprice") < col(v), 1L).otherwise(0L))
          (le + lit(1L) >= (lit(q) - lit(0.03)) * count(lit(1)) &&
            lt - lit(1L) <= (lit(q) + lit(0.03)) * count(lit(1)))
            .as(s"rank_ok_${v}")
        }
        o.crossJoin(broadcast(qs))
          .agg(count(lit(1)).as("n"), rankOk(0.5, "p50"), rankOk(0.9, "p90"))
      },
      Some("""SELECT count(*) AS n, true AS rank_ok_p50, true AS rank_ok_p90
             |FROM orders WHERE o_orderstatus IN ('F', 'O')""".stripMargin)),
  )
}
