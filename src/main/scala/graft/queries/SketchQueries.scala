package graft.queries

import org.apache.spark.sql.functions._

/** Mergeable-sketch analytics (Apache DataSketches via Spark 4 builtins):
  * the pre-aggregate-once / merge-at-query-time pattern that replaces
  * re-scanning raw data at 100 TB. Sketches are built per partition/group
  * with one partial→final aggregate, stored as binary columns, and later
  * UNIONED/INTERSECTED without touching the raw rows again — re-aggregation
  * a plain `countDistinct`/`percentile` can never do.
  *
  * All three are rows-only for the oracle (DataSketches estimates are not
  * reproducible in DuckDB's approx functions); SketchesSpec pins the
  * ground truth instead: merge-consistency identities (merged == direct)
  * and error bounds against the exact answers.
  */
object SketchQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Re-aggregatable distinct counts: one HLL sketch per order status,
    // estimates per group PLUS the global estimate obtained by merging the
    // group sketches (hll_union_agg) — not by re-scanning orders. The
    // register-max merge is lossless: the merged estimate is identical to
    // a direct whole-table sketch (SketchesSpec pins this equality).
    QueryDef(
      "q_sketch_hll_union",
      (s, dir) => {
        val sk = load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val perGroup = sk.select(col("o_orderstatus").as("scope"),
          hll_sketch_estimate(col("sk")).as("est_customers"))
        val merged = sk.agg(hll_union_agg(col("sk")).as("u"))
          .select(lit("ALL").as("scope"),
            hll_sketch_estimate(col("u")).as("est_customers"))
        perGroup.unionByName(merged).orderBy(col("scope"))
      },
      None),

    // Sketch set algebra: the customers active in 1997, in 1998, in both,
    // and in exactly one year — WITHOUT any join or re-scan: two theta
    // sketches, then union/intersection/difference on the sketches
    // themselves. The no-join audience-overlap query every corpus/usage
    // dashboard runs; at sf0.01 cardinalities sit in theta's exact mode,
    // so SketchesSpec can assert exact equality with the join answer.
    QueryDef(
      "q_sketch_theta_overlap",
      (s, dir) => {
        val o = load(s, dir, "orders")
        def yearSketch(y: Int) =
          o.filter(year(col("o_orderdate")) === y)
            .agg(theta_sketch_agg(col("o_custkey")).as("sk"))
        val both = yearSketch(1997).crossJoin(
          yearSketch(1998).withColumnRenamed("sk", "sk2"))
        both.select(
          round(theta_sketch_estimate(col("sk"))).cast("long").as("y1997"),
          round(theta_sketch_estimate(col("sk2"))).cast("long").as("y1998"),
          round(theta_sketch_estimate(theta_union(col("sk"), col("sk2"))))
            .cast("long").as("either"),
          round(theta_sketch_estimate(theta_intersection(col("sk"), col("sk2"))))
            .cast("long").as("both_years"),
          round(theta_sketch_estimate(theta_difference(col("sk"), col("sk2"))))
            .cast("long").as("only_1997"))
      },
      None),

    // Count-min frequency sketch: ONE distributed typed aggregate builds a
    // CMS over every corpus bigram (only the ~KB sketch reaches the
    // driver), then the exact top-20 heavy hitters are probed against it.
    // CMS never underestimates and overshoots by ≤ eps·N — both pinned in
    // SketchesSpec; rows-only for the oracle (sketch internals). The probe
    // uses UTF-8 bytes to match the aggregate's binary update path.
    QueryDef(
      "q_sketch_cms_topk",
      (s, dir) => {
        val words = split(col("text"), " ")
        val grams = when(size(words) >= 2,
            transform(sequence(lit(1), size(words) - 1),
              i => concat_ws(" ", element_at(words, i), element_at(words, i + 1))))
          .otherwise(array())
        // consumed twice (sketch build + exact counts): persist; the query
        // driver releases the cache between queries
        val stream = load(s, dir, "documents").select(explode(grams).as("g"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bytes = stream
          .agg(expr("count_min_sketch(g, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("cms"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
        val top = stream.groupBy(col("g")).agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("g")).limit(20)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val spark = s
        import spark.implicits._
        top.toSeq.map { case (g, exact) =>
          (g, exact, cms.estimateCount(
            g.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.toDF("ngram", "exact_cnt", "est_cnt")
          .orderBy(col("exact_cnt").desc, col("ngram"))
      },
      None),

    // Mergeable quantiles: per-status KLL sketches of o_totalprice merged
    // into one, then median/p90 read off the MERGED sketch — the shape
    // that lets 1000 ingest jobs each ship a KB-sized sketch instead of
    // re-sorting 100 TB for a global percentile.
    QueryDef(
      "q_sketch_kll_quantiles",
      (s, dir) => {
        val o = load(s, dir, "orders")
        def statusSketch(st: String, as: String) =
          o.filter(col("o_orderstatus") === st)
            .agg(kll_sketch_agg_double(col("o_totalprice")).as(as))
        statusSketch("F", "sk_f").crossJoin(statusSketch("O", "sk_o"))
          .select(kll_sketch_merge_double(col("sk_f"), col("sk_o")).as("m"))
          .select(
            kll_sketch_get_quantile_double(col("m"), lit(0.5)).as("p50"),
            kll_sketch_get_quantile_double(col("m"), lit(0.9)).as("p90"),
            kll_sketch_get_n_double(col("m")).as("n"))
      },
      None),
  )
}
