package graft.queries

import org.apache.spark.sql.functions._

/** Aggregations (hash agg, count-distinct, rollup/cube/grouping-sets,
  * collect_list/set, stats, percentiles) and window functions.
  *
  * All double-valued aggregates are rounded on both sides; Catalyst plans
  * these as partial→final HashAggregate automatically (map-side combine),
  * which is the 100 TB-safe shape: no driver-side collection anywhere.
  */
object AggQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Flagship: TPC-H Q1 pricing summary (SURVEY §7.2 minimum slice).
    QueryDef(
      "q1_pricing",
      (s, dir) => {
        load(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef(
      "q_count_distinct",
      (s, dir) => {
        load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
             |       count(*) AS n_orders
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // HLL sketch: register layouts differ across engines, so the estimate
    // itself can never hash-match — instead the query emits the EXACT
    // count plus a boolean asserting the sketch landed within 3 standard
    // errors (rsd=0.02 → 6%) of it, and the oracle emits the exact count
    // with a literal TRUE. A broken/drifting sketch flips the boolean and
    // fails the hash compare, so the approximate operator is genuinely
    // oracle-gated, not rows-only.
    QueryDef(
      "q_approx_distinct",
      (s, dir) => {
        load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
            countDistinct(col("o_custkey")).as("n_cust"))
          .select(col("o_orderstatus"), col("n_cust"),
            (abs(col("approx") - col("n_cust")) <=
              col("n_cust") * lit(0.06)).as("within_3se"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
             |  true AS within_3se
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    QueryDef(
      "q_rollup",
      (s, dir) => {
        val nation = load(s, dir, "nation")
        val region = load(s, dir, "region")
        val customer = load(s, dir, "customer")
        customer
          .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_cube",
      (s, dir) => {
        load(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    QueryDef(
      "q_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                |       grouping(o_orderstatus) AS g_status,
                |       grouping(o_orderpriority) AS g_prio
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY g_status, g_prio,
                |         o_orderstatus ASC NULLS FIRST,
                |         o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |       grouping(o_orderstatus) AS g_status,
             |       grouping(o_orderpriority) AS g_prio
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY g_status, g_prio,
             |         o_orderstatus ASC NULLS FIRST,
             |         o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // collect_list/collect_set: serialized to a canonical sorted CSV string
    // so the oracle compare is representation-independent.
    QueryDef(
      "q_collect_list",
      (s, dir) => {
        load(s, dir, "lineitem")
          .filter(col("l_orderkey") < 200)
          .groupBy(col("l_orderkey"))
          .agg(array_join(sort_array(collect_list(col("l_linenumber"))), ",")
              .as("linenumbers"),
            array_join(sort_array(collect_set(col("l_returnflag"))), ",")
              .as("flags"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey,
             |  array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
             |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
             |FROM lineitem WHERE l_orderkey < 200
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    QueryDef(
      "q_stats",
      (s, dir) => {
        load(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            round(avg(col("value")), 3).as("avg_v"),
            round(stddev_samp(col("value")), 3).as("std_v"),
            round(var_samp(col("value")), 3).as("var_v"),
            round(min(col("value")), 3).as("min_v"),
            round(max(col("value")), 3).as("max_v"),
            round(corr(col("value"), col("user_id").cast("double")), 3).as("corr_vu"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  round(avg(value), 3) AS avg_v,
             |  round(stddev_samp(value), 3) AS std_v,
             |  round(var_samp(value), 3) AS var_v,
             |  round(min(value), 3) AS min_v,
             |  round(max(value), 3) AS max_v,
             |  round(corr(value, CAST(user_id AS DOUBLE)), 3) AS corr_vu
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Ordered string aggregation (listagg / string_agg).
    QueryDef(
      "q_string_agg",
      (s, dir) => {
        load(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), "|")
            .as("nations"))
          .orderBy(col("n_regionkey"))
      },
      Some("""SELECT n_regionkey,
             |  string_agg(n_name, '|' ORDER BY n_name) AS nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // Conditional aggregation: count_if / filtered sums via CASE.
    QueryDef(
      "q_cond_agg",
      (s, dir) => {
        load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count_if(col("o_totalprice") > 200000).as("n_big"),
            // sum DECIMAL inputs, not doubles: decimal addition is exact and
            // associative, so the result is order-independent across engines
            // … then surface as integer CENTS / epoch MICROS: raw
            // decimal/timestamp outputs are banned by the r15 output
            // contract (dtype-representation hash divergence)
            (sum(when(col("o_orderpriority") === "1-URGENT",
                col("o_totalprice").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))) * lit(100))
              .cast("long").as("urgent_total_cents"),
            unix_micros(max(when(col("o_orderpriority") === "1-URGENT",
                col("o_orderdate"))))
              .as("last_urgent_us"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
             |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |               THEN CAST(o_totalprice AS DECIMAL(18,2))
             |               ELSE CAST(0 AS DECIMAL(18,2)) END) * 100
             |    AS BIGINT) AS urgent_total_cents,
             |  epoch_us(max(CASE WHEN o_orderpriority = '1-URGENT'
             |    THEN o_orderdate END)) AS last_urgent_us
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // min_by / max_by (argmin/argmax).
    QueryDef(
      "q_arg_minmax",
      (s, dir) => {
        load(s, dir, "supplier")
          .groupBy(col("s_nationkey"))
          .agg(
            // s_acctbal is unique per nation in this data, so the argmax
            // is deterministic without a composite tiebreak (DuckDB's
            // max_by cannot order by a struct)
            max_by(col("s_suppkey"), col("s_acctbal")).as("richest"),
            min_by(col("s_suppkey"), col("s_acctbal")).as("poorest"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey,
             |  max_by(s_suppkey, s_acctbal) AS richest,
             |  min_by(s_suppkey, s_acctbal) AS poorest
             |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // Exact interpolated percentile (Spark `percentile` == DuckDB
    // `quantile_cont`); the sketch-based scale path is q_approx_quantile.
    QueryDef(
      "q_percentile",
      (s, dir) => {
        load(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.5)"), 3).as("p50"),
            round(expr("percentile(value, 0.9)"), 3).as("p90"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 3) AS p50,
             |  round(quantile_cont(value, 0.9), 3) AS p90
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Approximate quantiles via Spark's mergeable KLL-style sketch — the
    // 100 TB path where exact percentile's per-group sort is the
    // bottleneck: single pass, fixed sketch memory, map-side merge.
    // Sketch internals differ from DuckDB's approx_quantile, so the raw
    // estimates can never hash-match. Instead the query VERIFIES the
    // sketch's own contract in-plan: approx_percentile(acc) returns an
    // element whose rank is within N/acc of the target, so re-joining the
    // quartiles against the data and counting rows `<`/`<=` each value
    // bounds its true rank fraction. The emitted booleans (tolerance
    // 2/acc, twice the guarantee, ± one row for rank discreteness) go
    // green on a working sketch and flip on a drifting one; the oracle
    // emits exact group counts + literal TRUEs. SamplingSpec still bounds
    // the numeric error against the exact percentile.
    QueryDef(
      "q_approx_quantile",
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val sketch = orders.groupBy(col("o_orderstatus"))
          .agg(expr(
            "approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 10000)")
            .as("qs"))
        def rankOk(q: Double, i: Int) = {
          val v = element_at(col("qs"), i)
          val le = sum(when(col("o_totalprice") <= v, 1L).otherwise(0L))
          val lt = sum(when(col("o_totalprice") < v, 1L).otherwise(0L))
          (le + lit(1L) >= (lit(q) - lit(0.0002)) * count(lit(1)) &&
            lt - lit(1L) <= (lit(q) + lit(0.0002)) * count(lit(1)))
            .as(s"rank_ok_q${(q * 100).toInt}")
        }
        orders.join(broadcast(sketch), "o_orderstatus")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            rankOk(0.25, 1), rankOk(0.50, 2), rankOk(0.75, 3))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |  true AS rank_ok_q25, true AS rank_ok_q50, true AS rank_ok_q75
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // Incremental aggregate maintenance — the append-only ingest pattern
    // at 100 TB: each arriving day folds into per-(day, status) PARTIALS
    // (sum/count/max in exact integer cents), and the running per-status
    // totals are a merge of partials — no re-scan of history, ever. The
    // query computes both the partial-merge and the direct aggregate and
    // emits a `partials_match` boolean beside the totals, so the oracle
    // (direct aggregate + literal TRUE) gates the re-aggregation law
    // sum∘sum = sum, count∘sum = count, max∘max = max — the property that
    // makes the incremental design safe. All-BIGINT; the merge input is
    // |days|×|statuses| rows, broadcastable at any corpus size.
    QueryDef(
      "q_incremental_agg",
      (s, dir) => {
        val o = load(s, dir, "orders").select(col("o_orderstatus"),
          date_trunc("day", col("o_orderdate")).as("day"),
          Tables.cents(col("o_totalprice")).as("cents"))
        val partials = o.groupBy(col("o_orderstatus"), col("day"))
          .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"),
            max(col("cents")).as("m"))
        val merged = partials.groupBy(col("o_orderstatus"))
          .agg(sum(col("s")).as("total_cents"), sum(col("n")).as("n_orders"),
            max(col("m")).as("max_cents"))
        val direct = o.groupBy(col("o_orderstatus"))
          .agg(sum(col("cents")).as("d_total"), count(lit(1)).as("d_n"),
            max(col("cents")).as("d_max"))
        merged.join(direct, "o_orderstatus")
          .select(col("o_orderstatus"), col("total_cents"), col("n_orders"),
            col("max_cents"),
            (col("total_cents") === col("d_total") &&
              col("n_orders") === col("d_n") &&
              col("max_cents") === col("d_max")).cast("int")
              .as("partials_match"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS total_cents,
             |  count(*) AS n_orders,
             |  max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |    AS max_cents,
             |  1 AS partials_match
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // Salted two-phase aggregation — the skew-safe groupBy companion to
    // q_join_salted: a handful of ultra-hot group keys (3 return flags
    // over the whole lineitem table — the worst case: fewer keys than
    // cores) would reduce on 3 tasks however many executors exist. Phase
    // 1 fans each key across 64 salt lanes (hash of the row's order key)
    // and partially aggregates per (key, salt); phase 2 merges the ≤
    // 64·|keys| partials — bounded, broadcast-scale — back to per-key
    // totals. Exact integer cents end-to-end, so the salted re-aggregation
    // is bit-identical to the direct GROUP BY the oracle runs; Spark's own
    // partial aggregation thins per-partition duplicates but cannot split
    // a hot key's REDUCE side — the salt lanes are what add that axis.
    QueryDef(
      "q_agg_salted",
      (s, dir) => {
        val li = load(s, dir, "lineitem")
        val partial = li
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(64)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(Tables.cents(col("l_quantity"))).as("q"),
            count(lit(1)).as("c"))
        partial.groupBy(col("l_returnflag"))
          .agg(sum(col("q")).as("sum_qty_cents"), sum(col("c")).as("cnt"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS sum_qty_cents,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),
  )
}
