package graft.queries

import org.apache.spark.sql.functions._

/** Round-2 analytic surface: pivot/unpivot reshaping, regexp functions,
  * covariance/regression aggregates, median/distribution shape, bitwise
  * aggregates, time-series gap-fill, and latest-record-per-key compaction.
  *
  * Scale notes, per operator, follow the same discipline as the rest of
  * the query library: aggregations are partial→final hash aggregates,
  * reshape operators are per-row expression work, the gap-fill calendar
  * spine is generated from a 1-row aggregate (broadcast, never a driver
  * collect), and latest-per-key is a WindowGroupLimit-prunable ranking.
  */
object AnalyticQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Pivot (long → wide): yearly revenue by order status. Catalyst plans
    // a pivot as ONE hash aggregate with pivot-value branches (no join,
    // no second shuffle) — the right shape at any scale when the pivot
    // value set is small and known.
    QueryDef(
      "q_pivot",
      (s, dir) => load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .orderBy(col("yr")),
      Some("""SELECT year(o_orderdate) AS yr,
             |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
             |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
             |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
             |FROM orders GROUP BY yr ORDER BY yr""".stripMargin)),

    // Unpivot (wide → long): per-row 1→N expression explode, shuffle-free.
    QueryDef(
      "q_unpivot",
      (s, dir) => load(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")),
          "key", "val")
        .orderBy(col("p_partkey"), col("key")),
      Some("""SELECT p_partkey, 'size' AS key, CAST(p_size AS DOUBLE) AS val FROM part
             |UNION ALL
             |SELECT p_partkey, 'retail' AS key, p_retailprice AS val FROM part
             |ORDER BY p_partkey, key""".stripMargin)),

    // Regexp functions: extract / replace-all / match — per-row codegen'd.
    QueryDef(
      "q_regexp_funcs",
      (s, dir) => load(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
          col("p_name").rlike("red|blue").cast("int").as("has_color"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
             |  CAST(regexp_matches(p_name, 'red|blue') AS INT) AS has_color
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Covariance + linear-regression aggregates (one partial→final hash
    // aggregate; the moment sums combine associatively map-side).
    QueryDef(
      "q_covar_regr",
      (s, dir) => load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 0).as("cov_p"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 0).as("cov_s"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(covar_pop(l_quantity, l_extendedprice), 0) AS cov_p,
             |  round(covar_samp(l_quantity, l_extendedprice), 0) AS cov_s,
             |  round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
             |  regr_count(l_extendedprice, l_quantity) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Median (exact interpolated percentile) + distribution shape.
    // Spark's skewness/kurtosis are population moments (g1, excess g2);
    // DuckDB's are sample-corrected — the oracle computes the population
    // forms from raw moments so both sides state the same quantity.
    QueryDef(
      "q_median_shape",
      (s, dir) => load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(median(col("l_quantity")), 2).as("med_qty"),
          round(skewness(col("l_discount")), 4).as("skew_disc"),
          round(kurtosis(col("l_discount")), 4).as("kurt_disc"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(median(l_quantity), 2) AS med_qty,
             |  round(avg((l_discount - m1) ^ 3) / (avg((l_discount - m1) ^ 2) ^ 1.5), 4) AS skew_disc,
             |  round(avg((l_discount - m1) ^ 4) / (avg((l_discount - m1) ^ 2) ^ 2) - 3, 4) AS kurt_disc
             |FROM (SELECT l_returnflag, l_quantity, l_discount,
             |        avg(l_discount) OVER (PARTITION BY l_returnflag) AS m1
             |      FROM lineitem)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Bitwise aggregates over int32 part sizes.
    QueryDef(
      "q_bitwise_agg",
      (s, dir) => load(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(bit_and(col("p_size")).as("size_and"),
          bit_or(col("p_size")).as("size_or"),
          bit_xor(col("p_size")).as("size_xor"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, bit_and(p_size) AS size_and,
             |  bit_or(p_size) AS size_or, bit_xor(p_size) AS size_xor,
             |  count(*) AS n
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Time-series gap-fill (resample): daily order counts with missing
    // calendar days filled with 0. The day spine comes from a 1-row
    // min/max aggregate exploded into dates — broadcast to the left join,
    // no driver round-trip, no generate-on-driver; at 100 TB the spine is
    // still only O(days).
    QueryDef(
      "q_gapfill",
      (s, dir) => {
        val daily = load(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_orders"))
        val spine = load(s, dir, "orders")
          .agg(min(to_date(col("o_orderdate"))).as("d0"),
            max(to_date(col("o_orderdate"))).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("day"))
        spine.join(daily, Seq("day"), "left")
          .select(datediff(col("day"), lit("1970-01-01").cast("date"))
              .as("day_epoch"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy(col("day_epoch"))
      },
      Some("""WITH spine AS (
             |  SELECT CAST(unnest(generate_series(
             |      CAST(min(o_orderdate) AS DATE),
             |      CAST(max(o_orderdate) AS DATE),
             |      INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM orders),
             |daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
             |  FROM orders GROUP BY day)
             |SELECT CAST(date_diff('day', DATE '1970-01-01', s.day) AS INT)
             |    AS day_epoch,
             |  coalesce(d.n_orders, 0) AS n_orders
             |FROM spine s LEFT JOIN daily d ON s.day = d.day
             |ORDER BY day_epoch""".stripMargin)),

    // Salted skew join, oracle-checked: result-identical to the plain
    // equi-join by construction — the DuckDB oracle IS the plain join, so
    // the salt/replicate/drop mechanics are correctness-gated, not just
    // spec-asserted.
    QueryDef(
      "q_join_salted",
      (s, dir) => {
        val orders = load(s, dir, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
        val customer = load(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        graft.plans.ScaleJoins.saltedJoin(orders, customer, "o_custkey", salts = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("rev"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Second string-function tier: split_part, printf-style formatting,
    // character translation — all per-row codegen'd builtins.
    QueryDef(
      "q_string_funcs2",
      (s, dir) => load(s, dir, "part")
        .select(col("p_partkey"),
          split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
          format_string("%s/%05d", col("p_brand"), col("p_size")).as("tag"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  split_part(p_name, ' ', 2) AS second_word,
             |  printf('%s/%05d', p_brand, p_size) AS tag,
             |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Scalar bitwise operators (AND/OR/XOR/shift) — distinct from the
    // bit_* aggregates.
    QueryDef(
      "q_bitwise_scalar",
      (s, dir) => load(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").bitwiseAND(lit(12)).as("b_and"),
          col("p_size").bitwiseOR(lit(3)).as("b_or"),
          col("p_size").bitwiseXOR(lit(21)).as("b_xor"),
          shiftleft(col("p_size"), 2).as("b_shl"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  p_size & 12 AS b_and, p_size | 3 AS b_or,
             |  xor(p_size, 21) AS b_xor, p_size << 2 AS b_shl
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // cume_dist window (completes the ranking-function family).
    QueryDef(
      "q_window_cume",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
        load(s, dir, "customer")
          .filter(col("c_custkey") <= 200)
          .select(col("c_custkey"), col("c_mktsegment"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  round(cume_dist() OVER (
             |    PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cd
             |FROM customer WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    // Histogram / value binning: fixed-width bins as floor division —
    // one hash aggregate, the standard distribution-profiling query.
    QueryDef(
      "q_histogram",
      (s, dir) => load(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).as("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bin")),
      Some("""SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
             |  count(*) AS n, round(min(o_totalprice), 2) AS lo,
             |  round(max(o_totalprice), 2) AS hi
             |FROM orders GROUP BY bin ORDER BY bin""".stripMargin)),

    // MERGE / upsert semantics (the lakehouse staple) as one full-outer
    // join: matched keys update, source-only keys insert, target-only
    // keys carry through — a single shuffle join, no per-row driver work.
    // Source keys with o_custkey % 7 == 0 are shifted out of the target
    // key range so the insert branch is actually exercised.
    QueryDef(
      "q_merge_upsert",
      (s, dir) => {
        // Money math in integer cents: double sums accumulate in
        // engine-specific order and flip round(x, 2) at .005 boundaries
        // (observed at sf0.1). The cents conversion is floor(x*100 + 0.5)
        // — pure IEEE double ops that evaluate bit-identically in Spark
        // and DuckDB, unlike round() (Spark HALF_UP on BigDecimal vs
        // DuckDB on the raw binary double). balance_cents is exact
        // integer cents: merged balance = target balance + source delta.
        def cents(c: org.apache.spark.sql.Column) = Tables.cents(c)
        val target = load(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_name"),
            cents(col("c_acctbal")).as("acct_cents"))
        val source = load(s, dir, "orders")
          .select(when(col("o_custkey") % 7 === 0, col("o_custkey") + 1000000)
            .otherwise(col("o_custkey")).as("k"),
            cents(col("o_totalprice")).as("price_cents"))
          .groupBy(col("k"))
          .agg(sum(col("price_cents")).as("delta_cents"))
        target.join(source, Seq("k"), "full_outer")
          .select(col("k"),
            coalesce(col("c_name"), lit("NEW")).as("name"),
            (coalesce(col("acct_cents"), lit(0L))
              + coalesce(col("delta_cents"), lit(0L))).as("balance_cents"))
          .orderBy(col("k"))
      },
      // DuckDB's sum(BIGINT) widens to HUGEINT (arrow decimal128) — the
      // values match Spark's int64 exactly but the driver's hash
      // canonicalization distinguishes the types, so the oracle must cast
      // the final total back to BIGINT (r2+r3 failed on type, not value).
      Some("""WITH source AS (
             |  SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 1000000
             |              ELSE o_custkey END AS k,
             |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS delta_cents
             |  FROM orders GROUP BY k)
             |SELECT coalesce(c.c_custkey, s.k) AS k,
             |  coalesce(c.c_name, 'NEW') AS name,
             |  CAST(coalesce(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT), 0)
             |    + coalesce(s.delta_cents, 0) AS BIGINT) AS balance_cents
             |FROM customer c FULL OUTER JOIN source s ON c.c_custkey = s.k
             |ORDER BY k""".stripMargin)),

    // Ratio-to-report / contribution analysis (the BI staple): each
    // nation's share of its region's revenue — a grouped sum (exact
    // cents) ratioed against its window total. The window runs over the
    // 25-row aggregate, not the fact table, so the partition-wide total
    // costs nothing; the share is one double division of exact integers
    // rounded at 4.
    QueryDef(
      "q_ratio_to_report",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("r_name"))
        val rev = load(s, dir, "customer")
          .join(load(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .join(load(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(Tables.cents(col("c_acctbal"))).as("rev_cents"))
        rev
          .withColumn("region_cents", sum(col("rev_cents")).over(w))
          .select(col("r_name"), col("n_name"), col("rev_cents"),
            round(col("rev_cents") * lit(1.0) / col("region_cents"), 4)
              .as("share"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""WITH rev AS (
             |  SELECT r_name, n_name,
             |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS rev_cents
             |  FROM customer
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  GROUP BY r_name, n_name)
             |SELECT r_name, n_name, rev_cents,
             |  round(rev_cents * 1.0 / sum(rev_cents)
             |    OVER (PARTITION BY r_name), 4) AS share
             |FROM rev ORDER BY r_name, n_name""".stripMargin)),

    // Column profiling (the deequ/pandas-profiling staple): count, null
    // count, distinct count, min, max per column in ONE scan — the
    // numeric columns unpivot to (column, value) rows feeding a single
    // hash aggregate, so profiling N columns costs one pass, not N.
    // Money values in exact cents; the unpivot is per-row expression
    // work, shuffle-free before the aggregate.
    QueryDef(
      "q_profile_columns",
      (s, dir) => load(s, dir, "orders")
        .select(col("o_orderkey"),
          Tables.cents(col("o_totalprice")).as("totalprice_cents"),
          col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("order_year"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("o_orderkey"), col("totalprice_cents"),
            col("o_custkey"), col("order_year")),
          "column", "v")
        .groupBy(col("column"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("column")),
      Some("""WITH u AS (
             |  SELECT 'o_orderkey' AS "column", o_orderkey AS v FROM orders
             |  UNION ALL
             |  SELECT 'totalprice_cents',
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) FROM orders
             |  UNION ALL
             |  SELECT 'o_custkey', o_custkey FROM orders
             |  UNION ALL
             |  SELECT 'order_year', CAST(year(o_orderdate) AS BIGINT)
             |  FROM orders)
             |SELECT "column", count(*) AS n_rows,
             |  CAST(coalesce(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END), 0)
             |    AS BIGINT) AS n_nulls,
             |  count(DISTINCT v) AS n_distinct,
             |  min(v) AS min_v, max(v) AS max_v
             |FROM u GROUP BY "column" ORDER BY "column"""".stripMargin)),

    // Robust outlier detection via median/MAD (the cleaning step where
    // mean/stddev fail — both are dragged by the very outliers they're
    // meant to find; the median absolute deviation has a 50% breakdown
    // point). Two grouped exact medians (one over values, one over
    // absolute deviations after a broadcast join of the group medians)
    // + a per-row flag — three hash aggregates total, no windows over
    // the full table. Money in exact cents so the deviation arithmetic
    // is integer-exact; the flag threshold is the standard 3×1.4826·MAD.
    QueryDef(
      "q_outlier_mad",
      (s, dir) => {
        val o = load(s, dir, "orders")
          .select(col("o_orderstatus").as("grp"),
            Tables.cents(col("o_totalprice")).as("v"))
        val med = o.groupBy(col("grp"))
          .agg(median(col("v")).as("med"))
        val mad = o.join(broadcast(med), "grp")
          .select(col("grp"), abs(col("v") - col("med")).as("dev"))
          .groupBy(col("grp")).agg(median(col("dev")).as("mad"))
        o.join(broadcast(med), "grp").join(broadcast(mad), "grp")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"),
            sum(when(abs(col("v") - col("med"))
              > lit(3 * 1.4826) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"),
            // uniform test data yields zero 3-MAD outliers; this nonzero
            // ratio proves the deviation arithmetic is really computed
            round(max(abs(col("v") - col("med"))) / first(col("mad")), 4)
              .as("max_dev_ratio")) // mad is per-group constant; first()

          .orderBy(col("grp"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderstatus AS grp,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
             |  FROM orders),
             |med AS (SELECT grp, median(v) AS med FROM o GROUP BY grp),
             |mad AS (
             |  SELECT o.grp, median(abs(v - med)) AS mad
             |  FROM o JOIN med USING (grp) GROUP BY o.grp)
             |SELECT o.grp, count(*) AS n,
             |  CAST(sum(CASE WHEN abs(v - med) > 3 * 1.4826 * mad
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |  round(max(abs(v - med)) / mad, 4) AS max_dev_ratio
             |FROM o JOIN med USING (grp) JOIN mad USING (grp)
             |GROUP BY o.grp, mad ORDER BY grp""".stripMargin)),

    // Data-quality constraint checks (the dbt-test / expectations shape):
    // uniqueness, not-null, domain, and referential-integrity violations
    // counted in one pass each — unioned into a single (check, violations)
    // report. The FK check is an anti-join (orders → customer), the
    // uniqueness check a group-count; every check is a distributed
    // aggregate, and a pipeline gates on `violations == 0`.
    QueryDef(
      "q_dq_checks",
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val customer = load(s, dir, "customer")
        val dupKeys = orders.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(coalesce(sum(col("c")), lit(0L)).as("violations"))
          .select(lit("orderkey_unique").as("check"), col("violations"))
        val nullCust = orders
          .agg(sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
            .as("violations"))
          .select(lit("custkey_not_null").as("check"), col("violations"))
        val badStatus = orders
          .agg(sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L)
            .otherwise(1L)).as("violations"))
          .select(lit("status_domain").as("check"), col("violations"))
        val orphans = orders.join(customer,
            orders("o_custkey") === customer("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("custkey_fk").as("check"), col("violations"))
        // deliberately violated on the test data (prices run to ~500k): a
        // report where every count is zero never proves the counters count
        val priceRange = orders
          .agg(sum(when(col("o_totalprice").between(0, 400000), 0L)
            .otherwise(1L)).as("violations"))
          .select(lit("totalprice_range").as("check"), col("violations"))
        dupKeys.unionByName(nullCust).unionByName(badStatus)
          .unionByName(orphans).unionByName(priceRange)
          .orderBy(col("check"))
      },
      Some("""SELECT 'custkey_fk' AS "check", count(*) AS violations
             |FROM orders o WHERE NOT EXISTS (
             |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
             |UNION ALL
             |SELECT 'custkey_not_null',
             |  CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
             |    AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'orderkey_unique', CAST(coalesce(sum(c), 0) AS BIGINT)
             |FROM (SELECT count(*) AS c FROM orders
             |      GROUP BY o_orderkey HAVING count(*) > 1)
             |UNION ALL
             |SELECT 'status_domain',
             |  CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
             |    THEN 0 ELSE 1 END), 0) AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'totalprice_range',
             |  CAST(coalesce(sum(CASE WHEN o_totalprice BETWEEN 0 AND 400000
             |    THEN 0 ELSE 1 END), 0) AS BIGINT)
             |FROM orders
             |ORDER BY "check"""".stripMargin)),

    // SCD Type-2 dimension build (the warehouse versioning staple): turn
    // a change log into validity-interval rows — each version valid from
    // its own timestamp until the next version's (NULL = current). One
    // shuffle on the business key into a lead() window; ties inside a key
    // break on the change id, so the interval chain is total and
    // deterministic. At scale this is the standard CDC → dimension-table
    // materialization: partition-parallel per key, no driver loops.
    QueryDef(
      "q_scd2",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("valid_from"), col("change_id"))
        load(s, dir, "orders")
          .filter(col("o_custkey") <= 200) // a readable slice of the log
          .select(col("o_custkey").as("k"), col("o_orderkey").as("change_id"),
            col("o_orderdate").as("valid_from"),
            Tables.cents(col("o_totalprice")).as("state_cents"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
          .withColumn("is_current", col("valid_to").isNull)
          .select(col("k"), col("change_id"),
            unix_micros(col("valid_from")).as("valid_from_us"),
            col("state_cents"),
            unix_micros(col("valid_to")).as("valid_to_us"),
            col("is_current"))
          .orderBy(col("k"), col("valid_from_us"), col("change_id"))
      },
      Some("""SELECT o_custkey AS k, o_orderkey AS change_id,
             |  epoch_us(o_orderdate) AS valid_from_us,
             |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS state_cents,
             |  epoch_us(lead(o_orderdate) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey)) AS valid_to_us,
             |  lead(o_orderdate) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
             |FROM orders WHERE o_custkey <= 200
             |ORDER BY k, valid_from_us, change_id""".stripMargin)),

    // Winsorization (outlier clipping at the 1st/99th percentile) — the
    // data-cleaning staple before any mean-based statistic. Bounds are
    // EXACT RANK PICKS (max of the bottom-k / min of the top-k by
    // (value, key)), not interpolated percentiles: interpolation
    // arithmetic can differ across engines, value picks cannot. The
    // bottom-k/top-k sides are TakeOrdered + 1-row aggregates broadcast
    // back over the corpus — no global sort or single-partition window;
    // the one driver-side count() sizes k only.
    QueryDef(
      "q_winsorize",
      (s, dir) => {
        val o = load(s, dir, "orders")
        val n = o.count()
        val k = ((n + 99) / 100).toInt // ceil(1%) as an integer rank
        val lo = o.orderBy(col("o_totalprice"), col("o_orderkey")).limit(k)
          .agg(max(col("o_totalprice")).as("lo"))
        val hi = o.orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
          .limit(k)
          .agg(min(col("o_totalprice")).as("hi"))
        o.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
          .select(col("o_orderkey"),
            least(greatest(col("o_totalprice"), col("lo")), col("hi"))
              .as("clipped"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH n AS (SELECT count(*) AS cnt FROM orders),
             |r AS (
             |  SELECT o_orderkey, o_totalprice,
             |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS ra,
             |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd
             |  FROM orders),
             |b AS (
             |  SELECT
             |    max(CASE WHEN ra <= (cnt + 99) // 100 THEN o_totalprice END) AS lo,
             |    min(CASE WHEN rd <= (cnt + 99) // 100 THEN o_totalprice END) AS hi
             |  FROM r, n)
             |SELECT o_orderkey,
             |  least(greatest(o_totalprice, lo), hi) AS clipped
             |FROM orders, b ORDER BY o_orderkey""".stripMargin)),

    // Latest record per key (CDC-style snapshot compaction): one ranking
    // window, prunable by WindowGroupLimit — the standard "current state
    // of every entity" query over an append-only event log.
    QueryDef(
      "q_latest_per_key",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        load(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            round(col("value"), 4).as("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type,
             |  round(value, 4) AS last_value
             |FROM events
             |QUALIFY row_number() OVER (
             |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
             |ORDER BY user_id""".stripMargin)),

    // CDC changelog apply (Debezium-shape compaction): a stream of keyed
    // upsert/delete ops collapses to the final table snapshot — the op
    // with the highest sequence wins, and a winning tombstone ('D')
    // removes the key from the snapshot entirely. The changelog is
    // derived deterministically from orders (key = o_custkey, sequence =
    // (o_orderdate, o_orderkey), every 10th orderkey a tombstone).
    // Unlike q_latest_per_key (a sort-window pick) the apply is ONE
    // hash aggregate — count + two max_by's over the sequence struct —
    // with map-side partial aggregation and no per-key sort, the shape
    // that compacts a 100 TB changelog without a window pass; the oracle
    // states the same semantics via QUALIFY row_number.
    QueryDef(
      "q_cdc_apply",
      (s, dir) => {
        val seq0 = struct(col("o_orderdate"), col("o_orderkey"))
        load(s, dir, "orders")
          .withColumn("op",
            when(col("o_orderkey") % 10 === 0, lit("D")).otherwise(lit("U")))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_ops"),
            max_by(col("op"), seq0).as("last_op"),
            max_by(col("o_totalprice"), seq0).as("p"))
          .filter(col("last_op") === "U")
          .select(col("o_custkey"), round(col("p"), 2).as("last_price"),
            col("n_ops"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, round(o_totalprice, 2) AS last_price, n_ops
             |FROM (
             |  SELECT o_custkey, o_totalprice,
             |    CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             |    row_number() OVER w AS rn,
             |    count(*) OVER (PARTITION BY o_custkey) AS n_ops
             |  FROM orders WINDOW w AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate DESC, o_orderkey DESC))
             |WHERE rn = 1 AND op = 'U'
             |ORDER BY o_custkey""".stripMargin)),

    // Benford leading-digit profile — the classic fraud/synthetic-data
    // detector in the DQ family (natural multiplicative quantities put
    // ~30.1% of leading digits at 1; uniform synthetics don't). Emits
    // observed counts and exact integer shares (micro-units, floor) per
    // digit — the judgment threshold stays with the caller, the profile
    // itself is engine-exact. One hash agg + 1-row broadcast total.
    QueryDef(
      "q_dq_benford",
      (s, dir) => {
        val d = load(s, dir, "orders").select(expr(
          "substring(cast(cast(floor(o_totalprice) as bigint) as string), 1, 1)")
          .as("digit"))
        val tot = d.agg(count(lit(1)).as("total"))
        d.groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("cnt"),
            expr("cnt * 1000000 div total").as("share_micro"))
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
             |    AS VARCHAR), 1, 1) AS digit
             |  FROM orders),
             |t AS (SELECT count(*) AS total FROM d)
             |SELECT digit, count(*) AS cnt,
             |  CAST(count(*) * 1000000 // (SELECT total FROM t) AS BIGINT)
             |    AS share_micro
             |FROM d GROUP BY digit ORDER BY digit""".stripMargin)),

    // Exponentially time-decayed counts — recency weighting for data
    // selection (favor users/sources with RECENT activity), computed in
    // EXACT integer arithmetic: an event aged k whole hours weighs
    // 2^(40−min(k,40)), i.e. weight halves per hour, as a BIGINT power
    // of two. The per-user sum is then an exact integer (denominator
    // 2^40 implied) — no float pow, no order-dependent rounding, so the
    // oracle matches bit-for-bit where a double formulation would flake.
    // Overflow bound: worst case every event lands in the newest hour, so
    // a per-user sum is ≤ n_events·2^40, which fits in 63 bits up to
    // 2^23 ≈ 8.4M events PER USER — orders of magnitude above any
    // supported scale factor (DuckDB would sum into HUGEINT and error on
    // the BIGINT cast while Spark wraps silently, so the ceiling keeps
    // the two engines from diverging on skewed users). Reference epoch =
    // max(ts) over the table via 1-row broadcast; map-side combined
    // single hash aggregate.
    QueryDef(
      "q_decay_counts",
      (s, dir) => {
        val ev = load(s, dir, "events")
          .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        val tmax = ev.agg(max(col("us")).as("us_max"))
        ev.crossJoin(broadcast(tmax))
          .withColumn("age_h",
            expr("least((us_max - us) div 3600000000, 40)"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(expr("shiftleft(cast(1 as bigint), cast(40 - age_h as int))"))
              .as("decay_num"))
          .orderBy(col("user_id"))
      },
      Some("""WITH t AS (SELECT max(epoch_us(ts)) AS us_max FROM events),
             |a AS (
             |  SELECT user_id,
             |    least((us_max - epoch_us(ts)) // 3600000000, 40) AS age_h
             |  FROM events, t)
             |SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CAST(1 AS BIGINT) << (40 - age_h)) AS BIGINT)
             |    AS decay_num
             |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Temporal (as-of dimension) join — the lookup SCD2 exists FOR: each
    // fact row joins the dimension VERSION valid at its event time
    // ([valid_from, valid_to) half-open, so every timestamp matches at
    // most one version; facts before the key's first version keep NULLs
    // via the left join). Scale shape: an equi-join on the dimension KEY
    // (co-partitioned, versions-per-key bounded by the change history —
    // never a range join against the whole version table) with the time
    // predicate as the join residual. Composes q_scd2's versioning with
    // the events fact stream; all-integer state so the oracle is exact.
    QueryDef(
      "q_temporal_join",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("valid_from"), col("change_id"))
        val dim = load(s, dir, "orders")
          .filter(col("o_custkey") <= 200)
          .select(col("o_custkey").as("k"), col("o_orderkey").as("change_id"),
            col("o_orderdate").as("valid_from"),
            Tables.cents(col("o_totalprice")).as("state_cents"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        val facts = load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        facts.join(dim,
            facts("user_id") === dim("k") &&
              col("ts") >= col("valid_from") &&
              (col("valid_to").isNull || col("ts") < col("valid_to")),
            "left")
          .select(col("event_id"), col("change_id"), col("state_cents"))
          .orderBy(col("event_id"))
      },
      Some("""WITH scd AS (
             |  SELECT o_custkey AS k, o_orderkey AS change_id,
             |    o_orderdate AS valid_from,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS state_cents,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS valid_to
             |  FROM orders WHERE o_custkey <= 200)
             |SELECT e.event_id, s.change_id, s.state_cents
             |FROM events e LEFT JOIN scd s
             |  ON e.user_id = s.k AND e.ts >= s.valid_from
             | AND (s.valid_to IS NULL OR e.ts < s.valid_to)
             |ORDER BY e.event_id""".stripMargin)),

    // Z-order (Morton) layout — the multi-dimensional data-skipping story:
    // interleaving the bits of (l_partkey, l_suppkey) and sorting/bucketing
    // by the result makes each bucket cover a small RECTANGLE of the key
    // space, so parquet min/max stats prune scans filtered on EITHER key
    // (a single-column sort only ever prunes one). The query emits the
    // per-bucket rectangles (count + min/max of both keys) — the bounded
    // ranges ARE the pruning property, and every number is pure integer
    // bit arithmetic the oracle recomputes term-for-term. Bucket width
    // derives from max(z) via a 1-row broadcast (SF-independent).
    {
      // 27 bits per key: covers the raw SFs (max l_partkey 2·10⁴ at
      // sf0.1) AND the ScaleCheck/BenchScale synthesis, which shifts
      // keys by k·10⁷ (max ≈ 9·10⁷ < 2^27) — zorder2 raises on
      // out-of-range keys, so an undersized width would crash the 10×
      // bench rather than degrade; 2·27 = 54 interleaved bits still fit
      // a BIGINT on both engines
      val bits = 27
      // DuckDB side of ScaleJoins.zorder2: same 2·bits-term interleave sum
      val zSql = (0 until bits).map { b =>
        s"((l_partkey >> $b) & 1) * ${1L << (2 * b)} + " +
          s"((l_suppkey >> $b) & 1) * ${1L << (2 * b + 1)}"
      }.mkString(" + ")
      QueryDef(
        "q_zorder_layout",
        (s, dir) => {
          val z = Tables.load(s, dir, "lineitem")
            .select(col("l_partkey"), col("l_suppkey"),
              graft.plans.ScaleJoins.zorder2(
                col("l_partkey"), col("l_suppkey"), bits).as("zv"))
          val width = z.agg(expr("max(zv) div 64 + 1").as("w"))
          z.crossJoin(broadcast(width))
            .groupBy(expr("zv div w").as("bucket"))
            .agg(count(lit(1)).as("cnt"),
              min(col("l_partkey")).as("min_part"),
              max(col("l_partkey")).as("max_part"),
              min(col("l_suppkey")).as("min_supp"),
              max(col("l_suppkey")).as("max_supp"))
            .orderBy(col("bucket"))
        },
        Some(s"""WITH z AS (
                |  SELECT l_partkey, l_suppkey, $zSql AS zv
                |  FROM lineitem),
                |w AS (SELECT max(zv) // 64 + 1 AS w FROM z)
                |SELECT zv // (SELECT w FROM w) AS bucket, count(*) AS cnt,
                |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
                |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin))
    },

    // THREE-dimensional Z-order layout (ScaleJoins.zorderN) — real
    // layout tuning interleaves 3-4 columns (date × key × domain); here
    // (l_partkey, l_suppkey, l_linenumber) at 20 bits each (3·20 = 60
    // interleaved bits — still one BIGINT on both engines). Same
    // hash-checkable contract as q_zorder_layout: per-bucket counts plus
    // min/max of ALL THREE keys — bounded boxes on every axis ARE the
    // pruning property — with the oracle restating the interleave sum
    // term-for-term at positions 3b/3b+1/3b+2.
    {
      val bits = 20
      val zSql = (0 until bits).map { b =>
        s"((l_partkey >> $b) & 1) * ${1L << (3 * b)} + " +
          s"((l_suppkey >> $b) & 1) * ${1L << (3 * b + 1)} + " +
          s"((l_linenumber >> $b) & 1) * ${1L << (3 * b + 2)}"
      }.mkString(" + ")
      QueryDef(
        "q_zorder3_layout",
        (s, dir) => {
          val z = Tables.load(s, dir, "lineitem")
            .select(col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
              graft.plans.ScaleJoins.zorderN(
                Seq(col("l_partkey"), col("l_suppkey"),
                  col("l_linenumber")), bits).as("zv"))
          val width = z.agg(expr("max(zv) div 64 + 1").as("w"))
          z.crossJoin(broadcast(width))
            .groupBy(expr("zv div w").as("bucket"))
            .agg(count(lit(1)).as("cnt"),
              min(col("l_partkey")).as("min_part"),
              max(col("l_partkey")).as("max_part"),
              min(col("l_suppkey")).as("min_supp"),
              max(col("l_suppkey")).as("max_supp"),
              min(col("l_linenumber")).as("min_line"),
              max(col("l_linenumber")).as("max_line"))
            .orderBy(col("bucket"))
        },
        Some(s"""WITH z AS (
                |  SELECT l_partkey, l_suppkey, l_linenumber, $zSql AS zv
                |  FROM lineitem),
                |w AS (SELECT max(zv) // 64 + 1 AS w FROM z)
                |SELECT zv // (SELECT w FROM w) AS bucket, count(*) AS cnt,
                |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
                |  min(l_linenumber) AS min_line, max(l_linenumber) AS max_line
                |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin))
    },

    // Hilbert-curve layout (ScaleJoins.hilbert2, native codegen'd loop) —
    // the range-locality upgrade over Morton: consecutive curve values
    // are always grid NEIGHBORS, so equal-width buckets cover compact,
    // never-split rectangles (the adjacency/bijectivity structure is
    // spec-gated in DataLayoutSpec; this query pins the VALUES). The
    // oracle replays the same rotate-reflect level loop as a recursive
    // CTE — 16 integer iterations per row, identical arithmetic — and
    // must land on identical per-bucket boxes.
    {
      val bits = 16
      QueryDef(
        "q_hilbert_layout",
        (s, dir) => {
          val h = Tables.load(s, dir, "lineitem")
            .select(col("l_partkey"), col("l_suppkey"),
              graft.plans.ScaleJoins.hilbert2(
                col("l_partkey"), col("l_suppkey"), bits).as("hv"))
          val width = h.agg(expr("max(hv) div 64 + 1").as("w"))
          h.crossJoin(broadcast(width))
            .groupBy(expr("hv div w").as("bucket"))
            .agg(count(lit(1)).as("cnt"),
              min(col("l_partkey")).as("min_part"),
              max(col("l_partkey")).as("max_part"),
              min(col("l_suppkey")).as("min_supp"),
              max(col("l_suppkey")).as("max_supp"))
            .orderBy(col("bucket"))
        },
        Some(s"""WITH RECURSIVE it AS (
                |  SELECT CAST(l_partkey AS BIGINT) AS px,
                |    CAST(l_suppkey AS BIGINT) AS py,
                |    CAST(l_partkey AS BIGINT) AS x,
                |    CAST(l_suppkey AS BIGINT) AS y,
                |    CAST(0 AS BIGINT) AS d,
                |    CAST(${1L << (bits - 1)} AS BIGINT) AS s
                |  FROM lineitem
                |  UNION ALL
                |  SELECT px, py,
                |    CASE WHEN (y & s) > 0 THEN x
                |         WHEN (x & s) > 0 THEN s - 1 - y ELSE y END,
                |    CASE WHEN (y & s) > 0 THEN y
                |         WHEN (x & s) > 0 THEN s - 1 - x ELSE x END,
                |    d + s * s * xor(
                |      3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                |      CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END),
                |    s // 2
                |  FROM it WHERE s > 0),
                |h AS (
                |  SELECT px AS l_partkey, py AS l_suppkey, d AS hv
                |  FROM it WHERE s = 0),
                |w AS (SELECT max(hv) // 64 + 1 AS w FROM h)
                |SELECT hv // (SELECT w FROM w) AS bucket, count(*) AS cnt,
                |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
                |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin))
    },
  )
}
