package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions: ranking, analytic (lag/lead/first/last), frames, ntile.
  *
  * Ranking over a ties-possible key exercises rank/dense_rank distinctly from
  * row_number; row_number itself always ranks over a fully deterministic key
  * (ties would make it nondeterministic across engines and runs).
  */
object WindowQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q_window_rank",
      (s, dir) => {
        // Ties possible on the price bucket → rank/dense_rank meaningful.
        val byBucket = Window.partitionBy(col("o_custkey"))
          .orderBy(col("price_bucket").desc, col("o_orderkey"))
        val tiesW = Window.partitionBy(col("o_custkey"))
          .orderBy(col("price_bucket").desc)
        load(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("price_bucket", floor(col("o_totalprice") / 50000))
          .withColumn("rn", row_number().over(byBucket))
          .withColumn("rk", rank().over(tiesW))
          .withColumn("drk", dense_rank().over(tiesW))
          .filter(col("rn") <= 5)
          .select(col("o_custkey"), col("rn"), col("rk"), col("drk"),
            col("o_orderkey"), col("price_bucket"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, rk, drk, o_orderkey, price_bucket FROM (
             |  SELECT o_custkey, o_orderkey,
             |    CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(floor(o_totalprice / 50000) AS BIGINT) DESC, o_orderkey) AS rn,
             |    rank() OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(floor(o_totalprice / 50000) AS BIGINT) DESC) AS rk,
             |    dense_rank() OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(floor(o_totalprice / 50000) AS BIGINT) DESC) AS drk
             |  FROM orders WHERE o_custkey < 100)
             |WHERE rn <= 5 ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef(
      "q_window_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        load(s, dir, "events")
          .filter(col("user_id") < 20)
          .withColumn("prev_v", lag(col("value"), 1).over(w))
          .withColumn("next_v", lead(col("value"), 1).over(w))
          .withColumn("first_v",
            first(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("event_id"), col("user_id"),
            round(col("prev_v"), 2).as("prev_v"),
            round(col("next_v"), 2).as("next_v"),
            round(col("first_v"), 2).as("first_v"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  round(lag(value, 1) OVER w, 2) AS prev_v,
             |  round(lead(value, 1) OVER w, 2) AS next_v,
             |  round(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_v
             |FROM events WHERE user_id < 20
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    QueryDef(
      "q_window_frames",
      (s, dir) => {
        val base = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        load(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("running_total",
            sum(col("o_totalprice")).over(base.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("moving_avg3",
            avg(col("o_totalprice")).over(base.rowsBetween(-2, 0)))
          // integer-dollar rounding: windowed double sums accumulate in
          // engine-specific order (DuckDB segment tree vs linear), so
          // 2-decimal rounding flips at .005 boundaries; at whole dollars
          // the ULP-scale difference can't reach a boundary
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("running_total")).cast("long").as("running_total"),
            round(col("moving_avg3")).cast("long").as("moving_avg3"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS running_total,
             |  CAST(round(avg(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS BIGINT) AS moving_avg3
             |FROM orders WHERE o_custkey < 100
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QueryDef(
      "q_window_ntile",
      (s, dir) => {
        val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
        load(s, dir, "customer")
          .withColumn("quartile", ntile(4).over(w))
          .select(col("c_custkey"), col("quartile"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_window_pct",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal"), col("s_suppkey"))
        load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"),
            round(percent_rank().over(w), 4).as("pct_rank"),
            round(cume_dist().over(w), 4).as("cume"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_nationkey,
             |  round(percent_rank() OVER w, 4) AS pct_rank,
             |  round(cume_dist() OVER w, 4) AS cume
             |FROM supplier
             |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
             |ORDER BY s_suppkey""".stripMargin)),

    QueryDef(
      "q_window_first_last",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        load(s, dir, "orders")
          .filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            last(col("o_orderkey")).over(w).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  first_value(o_orderkey) OVER w AS first_ok,
             |  last_value(o_orderkey) OVER w AS last_ok,
             |  nth_value(o_orderkey, 2) OVER w AS second_ok
             |FROM orders WHERE o_custkey < 50
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Range frame: per-nation, sum of acctbal of suppliers within ±100 of
    // the current supplier's balance (RANGE BETWEEN on an ordering value).
    QueryDef(
      "q_window_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal"))
          .rangeBetween(-100, 100)
        load(s, dir, "supplier")
          .withColumn("near_sum", sum(col("s_acctbal")).over(w))
          .select(col("s_suppkey"), col("s_nationkey"),
            round(col("near_sum"), 2).as("near_sum"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_nationkey,
             |  round(sum(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
             |    RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING), 2) AS near_sum
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),
  )
}
