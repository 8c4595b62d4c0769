package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table: tumbling/sliding window
  * aggregation (batch shape of the Structured Streaming operators in
  * `graft.streaming`), session windows, and an as-of join.
  *
  * `events.ts` always loads as a µs `TimestampType` regardless of the
  * parquet's physical encoding (Tables.load normalizes ns-legacy /
  * µs-NTZ / µs-LTZ), so outputs only emit µs-or-coarser timestamps
  * (window starts, second-truncations) and comparisons happen in
  * integer microseconds (`unix_micros` / DuckDB `epoch_us`).
  */
object EventQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q_events_tumbling",
      (s, dir) => {
        load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_v"))
          .select(unix_micros(col("w.start")).as("ws_us"),
            col("event_type"), col("cnt"), col("sum_v"))
          .orderBy(col("ws_us"), col("event_type"))
      },
      Some("""SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
             |  count(*) AS cnt, round(sum(value), 2) AS sum_v
             |FROM events GROUP BY ws_us, event_type
             |ORDER BY ws_us, event_type""".stripMargin)),

    // Sliding 1h window every 30min: each event lands in 2 windows; the SQL
    // equivalent materializes both via time_bucket and a shifted copy.
    QueryDef(
      "q_events_sliding",
      (s, dir) => {
        load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_micros(col("w.start")).as("ws_us"), col("cnt"))
          .orderBy(col("ws_us"))
      },
      Some("""SELECT epoch_us(ws) AS ws_us, count(*) AS cnt FROM (
             |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws FROM events
             |  UNION ALL
             |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events)
             |GROUP BY ws ORDER BY ws_us""".stripMargin)),

    // Session windows (5-minute gap) per user — batch session_window; the
    // SQL oracle reconstructs sessions via gaps-and-islands. A new session
    // starts when the gap is >= 5 min (Spark session end is exclusive).
    QueryDef(
      "q_events_session",
      (s, dir) => {
        load(s, dir, "events")
          .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"))
          .select(col("user_id"),
            unix_micros(date_trunc("second", col("w.start")))
              .as("session_start_us"),
            col("n_events"), col("sum_v"))
          .orderBy(col("user_id"), col("session_start_us"))
      },
      Some("""WITH d AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |              >= INTERVAL '5 minutes'
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts, value,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM d)
             |SELECT user_id,
             |  epoch_us(date_trunc('second', min(ts))) AS session_start_us,
             |  count(*) AS n_events, round(sum(value), 2) AS sum_v
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start_us""".stripMargin)),

    // As-of join: for each purchase event, the most recent click of the same
    // user strictly before it. Implemented the scalable way — a single
    // union + one window pass (last click carried forward), NOT a per-row
    // range join: O(n log n) per user vs O(n²), and it shuffles once by
    // user_id. The oracle does the quadratic formulation (fine for DuckDB
    // at this scale).
    QueryDef(
      "q_asof_join",
      (s, dir) => {
        val events = load(s, dir, "events")
        val clicks = events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
            lit(0).as("is_probe"), lit(null).cast("long").as("probe_id"))
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(null).cast("timestamp").as("click_ts"),
            lit(1).as("is_probe"), col("event_id").as("probe_id"))
        // Order clicks before purchases at identical ts? No: "strictly
        // before" → at equal ts the click must NOT match, so probes sort
        // first (is_probe desc) at ties.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_probe").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        clicks.unionByName(purchases)
          .withColumn("asof_click", last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1)
          .select(col("probe_id").as("event_id"),
            unix_micros(date_trunc("second", col("asof_click")))
              .as("prev_click_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id,
             |  epoch_us(date_trunc('second', max(c.ts))) AS prev_click_us
             |FROM events p
             |LEFT JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin)),

    // Forward as-of join (the other merge_asof direction): for every
    // purchase, the FIRST click strictly after it — same single-window
    // union formulation, ascending frame over the future.
    QueryDef(
      "q_asof_forward",
      (s, dir) => {
        val events = load(s, dir, "events")
        val clicks = events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
            lit(0).as("is_probe"), lit(null).cast("long").as("probe_id"))
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(null).cast("timestamp").as("click_ts"),
            lit(1).as("is_probe"), col("event_id").as("probe_id"))
        // strictly after → at equal ts the click must NOT match, so
        // probes sort last (is_probe asc) at ties; frame = rows after
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_probe").asc)
          .rowsBetween(1, Window.unboundedFollowing)
        clicks.unionByName(purchases)
          .withColumn("next_click",
            first(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1)
          .select(col("probe_id").as("event_id"),
            unix_micros(date_trunc("second", col("next_click")))
              .as("next_click_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id,
             |  epoch_us(date_trunc('second', min(c.ts))) AS next_click_us
             |FROM events p
             |LEFT JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin)),

    // Rolling 7-day distinct users per day (the WAU metric): each event
    // EXPLODES to the 7 daily windows it contributes to (one explode +
    // one distinct-agg — never a per-day self-join against the event
    // table; ×7 row amplification is linear and the standard shape for
    // sliding distinct counts, since COUNT(DISTINCT) does not decompose
    // over window frames). Only days with events appear (the 7-window
    // membership makes trailing windows of quiet days appear too).
    QueryDef(
      "q_rolling_distinct",
      (s, dir) => {
        val ev = load(s, dir, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
        val days = ev.select(col("d")).distinct()
        ev.select(col("user_id"), col("d"),
            explode(sequence(lit(0), lit(6))).as("off"))
          .withColumn("w_day", expr("d + make_interval(0, 0, 0, off)"))
          .join(days.select(col("d").as("w_day")), Seq("w_day"))
          .groupBy(col("w_day"))
          .agg(countDistinct(col("user_id")).as("wau"))
          .select(unix_micros(col("w_day")).as("w_day_us"), col("wau"))
          .orderBy(col("w_day_us"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('day', ts) AS d FROM events),
             |days AS (SELECT DISTINCT d FROM e),
             |win AS (
             |  SELECT e.user_id, e.d + o.off * INTERVAL '1 day' AS w_day
             |  FROM e, LATERAL (SELECT unnest(generate_series(0, 6)) AS off) o)
             |SELECT epoch_us(w.w_day) AS w_day_us,
             |  count(DISTINCT w.user_id) AS wau
             |FROM win w JOIN days ON days.d = w.w_day
             |GROUP BY w.w_day ORDER BY w_day_us""".stripMargin)),

    // As-of join with TOLERANCE (merge_asof's tolerance parameter): the
    // most recent click strictly before each purchase, kept only when it
    // falls within 5 minutes — older matches become NULL, exactly
    // pandas' semantics (the single most-recent candidate either passes
    // the tolerance or the probe gets no match; equivalently, max(ts)
    // over the bounded window). Same union + one-window shape as
    // q_asof_join — the tolerance is a per-row µs comparison AFTER the
    // window, so the plan cost is unchanged. Oracle compares at
    // MICROseconds throughout (ts loads at µs precision; see header).
    QueryDef(
      "q_asof_tolerance",
      (s, dir) => {
        val events = load(s, dir, "events")
        val clicks = events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
            lit(0).as("is_probe"), lit(null).cast("long").as("probe_id"))
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            lit(null).cast("timestamp").as("click_ts"),
            lit(1).as("is_probe"), col("event_id").as("probe_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_probe").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        clicks.unionByName(purchases)
          .withColumn("asof_click",
            last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1)
          .select(col("probe_id").as("event_id"),
            unix_micros(date_trunc("second",
              when(expr("unix_micros(ts) - unix_micros(asof_click)")
                <= lit(300000000L), col("asof_click"))))
              .as("prev_click_5m_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id,
             |  epoch_us(date_trunc('second', max(c.ts))) AS prev_click_5m_us
             |FROM events p
             |LEFT JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             | AND epoch_us(c.ts) < epoch_us(p.ts)
             | AND epoch_us(p.ts) - epoch_us(c.ts) <= 300000000
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin)),

    // Nearest as-of join (the third merge_asof direction): for every
    // purchase, the click with the smallest |Δt| in EITHER direction,
    // ties preferring backward (pandas semantics). Both directional
    // lookups ride the same union + user_id-partitioned windows — same
    // single shuffle as q_asof_join, never a per-row range join. Distances
    // compare in integer MICROSECONDS on both engines (events.ts is ns
    // parquet; both sides truncate to µs), so the pick is engine-exact.
    QueryDef(
      "q_asof_nearest",
      (s, dir) => {
        val events = load(s, dir, "events")
        val clicks = events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
            lit(0).as("is_probe"), lit(null).cast("long").as("probe_id"))
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            lit(null).cast("timestamp").as("click_ts"),
            lit(1).as("is_probe"), col("event_id").as("probe_id"))
        // strict on both sides: at equal ts the click matches neither
        // direction (probes sort first desc / last asc at ties)
        val wBack = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_probe").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wFwd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_probe").asc)
          .rowsBetween(1, Window.unboundedFollowing)
        clicks.unionByName(purchases)
          .withColumn("back", last(col("click_ts"), ignoreNulls = true).over(wBack))
          .withColumn("fwd", first(col("click_ts"), ignoreNulls = true).over(wFwd))
          .filter(col("is_probe") === 1)
          .withColumn("dt_back", expr("unix_micros(ts) - unix_micros(back)"))
          .withColumn("dt_fwd", expr("unix_micros(fwd) - unix_micros(ts)"))
          .select(col("probe_id").as("event_id"),
            date_trunc("second",
              when(col("back").isNull, col("fwd"))
                .when(col("fwd").isNull, col("back"))
                .when(col("dt_back") <= col("dt_fwd"), col("back"))
                .otherwise(col("fwd"))).as("nearest_click_s"))
          .select(col("event_id"),
            unix_micros(col("nearest_click_s")).as("nearest_click_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'),
             |cand AS (
             |  SELECT p.event_id, c.ts AS cts,
             |    row_number() OVER (PARTITION BY p.event_id
             |      ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
             |               CASE WHEN epoch_us(c.ts) < epoch_us(p.ts)
             |                    THEN 0 ELSE 1 END) AS rk
             |  FROM p JOIN events c
             |    ON c.user_id = p.user_id AND c.event_type = 'click'
             |   -- compare at MICROseconds (both engines read us data; the
             |   -- integer epoch_us comparison stays exact either way)
             |   AND epoch_us(c.ts) <> epoch_us(p.ts))
             |SELECT p.event_id,
             |  epoch_us(date_trunc('second', cand.cts)) AS nearest_click_us
             |FROM p LEFT JOIN cand ON cand.event_id = p.event_id AND rk = 1
             |ORDER BY p.event_id""".stripMargin)),

    // OHLC time-series resampling: per-hour open/high/low/close over the
    // event value stream — the downsampling staple for telemetry/market
    // data. One window pass for the endpoint ranks (WindowGroupLimit-able)
    // + one hash aggregate; open/close/min/max are EXACT picks of existing
    // 2-decimal values (no float accumulation), so the oracle compare is
    // boundary-free.
    QueryDef(
      "q_events_ohlc",
      (s, dir) => {
        val hour = date_trunc("hour", col("ts"))
        val wAsc = Window.partitionBy(col("h"))
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy(col("h"))
          .orderBy(col("ts").desc, col("event_id").desc)
        load(s, dir, "events")
          .withColumn("h", hour)
          .withColumn("rn_a", row_number().over(wAsc))
          .withColumn("rn_d", row_number().over(wDesc))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("low"),
            max(col("value")).as("high"),
            max(when(col("rn_a") === 1, col("value"))).as("open"),
            max(when(col("rn_d") === 1, col("value"))).as("close"))
          .select(unix_micros(col("h")).as("h_us"), col("n"), col("low"),
            col("high"), col("open"), col("close"))
          .orderBy(col("h_us"))
      },
      Some("""WITH r AS (
             |  SELECT date_trunc('hour', ts) AS h, value,
             |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
             |      ORDER BY ts, event_id) AS rn_a,
             |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
             |      ORDER BY ts DESC, event_id DESC) AS rn_d
             |  FROM events)
             |SELECT epoch_us(h) AS h_us, count(*) AS n,
             |  min(value) AS low, max(value) AS high,
             |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
             |  max(CASE WHEN rn_d = 1 THEN value END) AS close
             |FROM r GROUP BY h ORDER BY h_us""".stripMargin)),

    // Gap/delta analysis: time since previous event per user (any type).
    QueryDef(
      "q_events_gaps",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        load(s, dir, "events")
          .withColumn("gap_s",
            (col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double")))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("gap_s")), 1).as("avg_gap_s"),
            round(max(col("gap_s")), 1).as("max_gap_s"))
          .orderBy(col("user_id"))
      },
      Some("""WITH d AS (
             |  SELECT user_id,
             |    CAST(epoch(ts) AS DOUBLE)
             |      - CAST(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS DOUBLE)
             |      AS gap_s
             |  FROM events)
             |SELECT user_id, count(*) AS n,
             |  round(avg(gap_s), 1) AS avg_gap_s,
             |  round(max(gap_s), 1) AS max_gap_s
             |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Time-weighted aggregation (telemetry/TWAP staple): each reading
    // holds until the next one, so its weight is that duration — a plain
    // mean over-counts bursts and under-counts stable periods. dt via
    // lead() in exact integer MICROSECONDS (seconds-level epoch() rounds vs
    // truncates differently across engines); value in centi-units so the
    // sums are exact BIGINTs (float sums can't hash-match). The weighted
    // mean is the downstream ratio of two exact integers.
    QueryDef(
      "q_events_twa",
      (s, dir) => {
        load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            Tables.cents(col("value")).as("v_centi"))
          .withColumn("dt_us",
            expr("unix_micros(lead(ts, 1) OVER (PARTITION BY user_id" +
              " ORDER BY ts, event_id)) - unix_micros(ts)"))
          .filter(col("dt_us").isNotNull) // last reading has no duration
          .groupBy(col("user_id"))
          .agg(sum(col("v_centi") * col("dt_us")).as("sum_v_centi_us"),
            sum(col("dt_us")).as("sum_dt_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH d AS (
             |  SELECT user_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_centi,
             |    epoch_us(lead(ts) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
             |  FROM events)
             |SELECT user_id,
             |  CAST(sum(v_centi * dt_us) AS BIGINT) AS sum_v_centi_us,
             |  CAST(sum(dt_us) AS BIGINT) AS sum_dt_us
             |FROM d WHERE dt_us IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Ordered funnel (view → click → purchase, each step within 1 day
    // of the previous): each step's timestamp is the first qualifying
    // event inside the conversion window after the previous step — the
    // product-analytics staple. Three conditional min-aggregates chained
    // by user_id equi-joins (same key → one logical shuffle under AQE);
    // per-user work is bounded, no windows over the whole stream, no
    // driver loops. Counts per furthest-stage-reached are the output.
    QueryDef(
      "q_events_funnel",
      (s, dir) => {
        val ev = load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") >= col("v_ts")
            && col("ts") <= col("v_ts") + expr("interval 1 day"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") >= col("c_ts")
            && col("ts") <= col("c_ts") + expr("interval 1 day"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        v.join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("p_ts").isNotNull, 3)
              .when(col("c_ts").isNotNull, 2)
              .otherwise(1).as("stage"))
          .groupBy(col("stage")).agg(count(lit(1)).as("users"))
          .orderBy(col("stage"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS v_ts FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS c_ts
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
             |    AND e.ts <= v.v_ts + INTERVAL 1 DAY
             |  GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS p_ts
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
             |    AND e.ts <= c.c_ts + INTERVAL 1 DAY
             |  GROUP BY e.user_id)
             |SELECT CASE WHEN p_ts IS NOT NULL THEN 3
             |            WHEN c_ts IS NOT NULL THEN 2 ELSE 1 END AS stage,
             |  count(*) AS users
             |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
             |GROUP BY stage ORDER BY stage""".stripMargin)),

    // Retention cohort grid: users bucketed by first-activity day, then
    // distinct-user counts per (cohort_day, day_offset) — the growth-
    // analytics table behind every retention curve. Two hash aggregates
    // and one user_id equi-join; day arithmetic in pure integer
    // datediff, so the grid is exact on both engines.
    QueryDef(
      "q_events_retention",
      (s, dir) => {
        val ev = load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val cohort = ev.groupBy(col("user_id"))
          .agg(min(col("d")).as("cohort_day"))
        ev.join(cohort, "user_id")
          .groupBy(datediff(col("cohort_day"), lit("1970-01-01").cast("date"))
              .as("cohort_day_epoch"),
            datediff(col("d"), col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy(col("cohort_day_epoch"), col("day_offset"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
             |cohort AS (
             |  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id)
             |SELECT CAST(date_diff('day', DATE '1970-01-01', cohort_day)
             |    AS INT) AS cohort_day_epoch,
             |  date_diff('day', cohort_day, d) AS day_offset,
             |  count(DISTINCT user_id) AS active_users
             |FROM ev JOIN cohort USING (user_id)
             |GROUP BY cohort_day_epoch, day_offset
             |ORDER BY cohort_day_epoch, day_offset""".stripMargin)),

    // Interval-union coverage: each event opens a 5-minute activity
    // interval; overlapping intervals merge (gaps-and-islands via the
    // running-max-end trick: a new island starts where an interval's
    // start clears every prior end), and the answer is the total COVERED
    // time per user — the deduplicated "active minutes" metric naive
    // sum-of-durations double-counts. One user_id shuffle, two window
    // passes, exact integer microseconds end-to-end.
    QueryDef(
      "q_events_coverage",
      (s, dir) => {
        val iv = load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("st"))
          .withColumn("en", col("st") + lit(300000000L)) // +5 min
        val wPrev = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wRun = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        iv.withColumn("new_island",
            when(col("st") > coalesce(max(col("en")).over(wPrev),
              lit(Long.MinValue)), 1).otherwise(0))
          .withColumn("island", sum(col("new_island")).over(wRun))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("st")).as("is"), max(col("en")).as("ie"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_islands"),
            sum(col("ie") - col("is")).as("covered_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS st,
             |    epoch_us(ts) + 300000000 AS en
             |  FROM events),
             |mk AS (
             |  SELECT user_id, st, en,
             |    CASE WHEN st > coalesce(max(en) OVER (
             |        PARTITION BY user_id ORDER BY st, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |        -9223372036854775808) THEN 1 ELSE 0 END AS new_island,
             |    event_id
             |  FROM iv),
             |isl AS (
             |  SELECT user_id, st, en,
             |    sum(new_island) OVER (PARTITION BY user_id
             |      ORDER BY st, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS island
             |  FROM mk),
             |g AS (
             |  SELECT user_id, island, min(st) AS i_s, max(en) AS i_e
             |  FROM isl GROUP BY user_id, island)
             |SELECT user_id, count(*) AS n_islands,
             |  CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Sliding-window anomaly detection (z-score vs the trailing 20
    // readings per event type) — the telemetry/data-quality monitor. The
    // usual float mean/stddev can never hash-match across engines, so the
    // test is algebraically cleared of divisions: with frame sums S1=Σv,
    // S2=Σv² over n trailing centi-unit values,
    //   |z| > 3  ⇔  (n·v − S1)² > 9·(n·S2 − S1²)
    // — pure BIGINT on both sides (centi-values ≤ ~1e5 keep every term
    // under ~1e13). One window pass, ROWS frame, no self-join; flags only
    // fire once the frame has ≥ 10 readings. Output is the per-type
    // anomaly count + total so the compare stays small at any SF.
    QueryDef(
      "q_events_anomaly",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-20, -1)
        load(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            Tables.cents(col("value")).as("v"))
          .select(col("event_type"), col("v"),
            count(col("v")).over(w).as("n"),
            sum(col("v")).over(w).as("s1"),
            sum(col("v") * col("v")).over(w).as("s2"))
          .select(col("event_type"),
            (col("n") >= 10 &&
              (col("n") * col("v") - col("s1")) *
                (col("n") * col("v") - col("s1")) >
              lit(9) * (col("n") * col("s2") - col("s1") * col("s1")))
              .cast("int").as("is_anomaly"))
          .groupBy(col("event_type"))
          .agg(sum(col("is_anomaly")).as("n_anomalies"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"))
      },
      Some("""WITH v AS (
             |  SELECT event_type, ts, event_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |f AS (
             |  SELECT event_type, v,
             |    count(v) OVER w AS n,
             |    CAST(sum(v) OVER w AS BIGINT) AS s1,
             |    CAST(sum(v * v) OVER w AS BIGINT) AS s2
             |  FROM v
             |  -- order by MICROsecond-truncated ts (+ event_id tiebreak)
             |  -- to replay Spark's us-truncated parquet read; raw ns ts
             |  -- would order same-us events differently than the tiebreak
             |  WINDOW w AS (PARTITION BY event_type
             |               ORDER BY epoch_us(ts), event_id
             |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
             |SELECT event_type,
             |  CAST(sum(CAST(n >= 10
             |    AND (n * v - s1) * (n * v - s1) > 9 * (n * s2 - s1 * s1)
             |    AS INT)) AS BIGINT) AS n_anomalies,
             |  count(*) AS n_events
             |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // First-order Markov transition matrix over per-user event streams —
    // the clickstream model behind "what follows a view" product
    // analytics (and the random-surfer estimate PageRank discretizes):
    // consecutive-event (from → to) counts per user in (ts, event_id)
    // order, with transition probabilities in exact floor-division
    // micro-units. The lag window partitions by user_id — per-user state
    // only, never a window over the whole stream.
    QueryDef(
      "q_events_markov",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val steps = load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("cnt"))
        val totals = steps.groupBy(col("from_type"))
          .agg(sum(col("cnt")).as("from_total"))
        steps.join(totals, "from_type")
          .withColumn("p_micro", expr("cnt * 1000000L div from_total"))
          .select(col("from_type"), col("to_type"), col("cnt"),
            col("p_micro"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH st AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |                           ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (
             |  SELECT from_type, to_type, count(*) AS cnt
             |  FROM st WHERE to_type IS NOT NULL
             |  GROUP BY from_type, to_type),
             |t AS (
             |  SELECT from_type, CAST(sum(cnt) AS BIGINT) AS from_total
             |  FROM c GROUP BY from_type)
             |SELECT from_type, to_type, cnt,
             |  cnt * 1000000 // from_total AS p_micro
             |FROM c JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // Exponentially-weighted moving average over per-type hourly counts
    // (Brown 1956 — the smoothing behind every ops dashboard's
    // "expected traffic" line; the EWMA level IS the one-step
    // forecast). INTEGER-EXACT recursion: the level lives in count
    // micro-units and each step is s' = (α·x·1e6 + (1−α)·s) div 1e6
    // with α = 0.3 — pure BIGINT arithmetic both engines replay bit for
    // bit (a float EWMA would compound rounding differently). Per-type
    // state is the bounded hourly array (collect + fold with an
    // explicit scaled seed; DuckDB's init-less list_reduce gets the
    // seed PREPENDED as its first element).
    QueryDef(
      "q_events_ewma",
      (s, dir) => {
        val hourly = load(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("cnt"))
        hourly.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            transform(sort_array(collect_list(
              struct(col("h"), col("cnt")))), x => x.getField("cnt"))
              .as("cs"))
          .withColumn("ewma_micro", expr(
            """aggregate(
              |  slice(cs, 2, greatest(size(cs) - 1, 0)),
              |  element_at(cs, 1) * 1000000L,
              |  (acc, x) ->
              |    (300000L * x * 1000000L + 700000L * acc) div 1000000L
              |)""".stripMargin))
          .select(col("event_type"), col("n_hours"), col("ewma_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h,
             |    count(*) AS cnt
             |  FROM events GROUP BY event_type, h),
             |srt AS (
             |  SELECT event_type,
             |    CAST(count(*) AS BIGINT) AS n_hours,
             |    list(CAST(cnt AS BIGINT) ORDER BY h) AS cs
             |  FROM hourly GROUP BY event_type)
             |SELECT event_type, n_hours,
             |  list_reduce(
             |    list_prepend(cs[1] * 1000000, cs[2:]),
             |    (acc, x) ->
             |      (300000 * x * 1000000 + 700000 * acc) // 1000000)
             |    AS ewma_micro
             |FROM srt ORDER BY event_type""".stripMargin)),

    // DYNAMIC-gap session windows (the Spark-4 gap-expression form of
    // q_events_session): the inactivity gap depends on the EVENT — an
    // error tightens it to 2 minutes, everything else keeps 5 — the
    // shape real sessionization uses (checkout pages get longer grace
    // than errors). The oracle replays Spark's merge rule exactly via
    // gaps-and-islands over the running cumulative MAX of per-event
    // window ends (an event joins the session iff its µs start is
    // under that max), all in integer microseconds.
    QueryDef(
      "q_events_session_dynamic",
      (s, dir) => {
        // NOTE: the gap expression must be CalendarIntervalType — ANSI
        // INTERVAL literals parse as DayTimeInterval and are rejected;
        // string gaps coerce correctly
        val gap = when(col("event_type") === "error", lit("2 minutes"))
          .otherwise(lit("5 minutes"))
        load(s, dir, "events")
          .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_errors"))
          .select(col("user_id"),
            unix_micros(date_trunc("second", col("w.start")))
              .as("session_start_us"),
            col("n_events"), col("n_errors"))
          .orderBy(col("user_id"), col("session_start_us"))
      },
      Some("""WITH d AS (
             |  SELECT user_id, ts, event_type,
             |    epoch_us(ts) AS t_us,
             |    epoch_us(ts) + CASE WHEN event_type = 'error'
             |      THEN 120000000 ELSE 300000000 END AS end_us
             |  FROM events),
             |m AS (
             |  SELECT user_id, ts, event_type, t_us,
             |    max(end_us) OVER (PARTITION BY user_id
             |      ORDER BY t_us, end_us
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS prev_max_end
             |  FROM d),
             |f AS (
             |  SELECT user_id, ts, event_type,
             |    CASE WHEN prev_max_end IS NULL
             |           OR t_us >= prev_max_end THEN 1 ELSE 0 END AS new_s
             |  FROM m),
             |g AS (
             |  SELECT user_id, ts, event_type,
             |    sum(new_s) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts)
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS sid
             |  FROM f)
             |SELECT user_id,
             |  epoch_us(date_trunc('second', min(ts))) AS session_start_us,
             |  count(*) AS n_events,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_errors
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, session_start_us""".stripMargin)),

    // Top user journeys (path analysis — the "what do users actually
    // do" product-analytics staple): each user's first five event types
    // in (ts, event_id) order joined as a path string, counted, top 20
    // paths by frequency (ties → path asc). The per-user slice is a
    // bounded window (5 rows survive); the path census is one hash
    // aggregation; the top-20 plans as TakeOrderedAndProject.
    QueryDef(
      "q_events_paths",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 5)
          .groupBy(col("user_id"))
          .agg(array_join(transform(sort_array(collect_list(
              struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), " > ").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path")).limit(20)
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS rn
             |  FROM events),
             |p AS (
             |  SELECT user_id,
             |    string_agg(event_type, ' > ' ORDER BY rn) AS path
             |  FROM r WHERE rn <= 5 GROUP BY user_id)
             |SELECT path, count(*) AS n_users
             |FROM p GROUP BY path
             |ORDER BY n_users DESC, path LIMIT 20""".stripMargin)),

    // Last-touch marketing attribution (the funnel's credit-assignment
    // step): every purchase attributes to the user's most recent click
    // or view within the hour before it. The time-band predicate
    // resolves Spark-side through the LOSSLESS hour-band equi-join (the
    // proximity-search pattern: purchase hour probes its own and the
    // previous hour's band — a touch within 1h always lands there), so
    // no inequality join reaches the planner; the last-touch argmax is
    // a per-purchase window over the banded candidates. Exact integers:
    // the gap rides in microseconds.
    QueryDef(
      "q_events_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("p_us"))
          .withColumn("probe", explode(array(
            expr("p_us div 3600000000L"),
            expr("p_us div 3600000000L - 1"))))
        val touches = ev.filter(col("event_type").isin("click", "view"))
          .select(col("user_id").as("t_user"),
            col("event_id").as("touch_id"),
            col("event_type").as("touch_type"),
            unix_micros(col("ts")).as("t_us"))
          .withColumn("band", expr("t_us div 3600000000L"))
        val wPick = Window.partitionBy(col("purchase_id"))
          .orderBy(col("t_us").desc, col("touch_id").desc)
        purchases.join(touches,
            col("t_user") === col("user_id") &&
              col("band") === col("probe") &&
              col("t_us") < col("p_us") &&
              col("t_us") >= col("p_us") - lit(3600000000L))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("purchase_id"), col("touch_id"), col("touch_type"),
            (col("p_us") - col("t_us")).as("gap_us"))
          .orderBy(col("purchase_id"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, event_id AS purchase_id,
             |    epoch_us(ts) AS p_us
             |  FROM events WHERE event_type = 'purchase'),
             |t AS (
             |  SELECT user_id, event_id AS touch_id,
             |    event_type AS touch_type, epoch_us(ts) AS t_us
             |  FROM events WHERE event_type IN ('click', 'view')),
             |j AS (
             |  SELECT p.purchase_id, t.touch_id, t.touch_type,
             |    p.p_us - t.t_us AS gap_us,
             |    row_number() OVER (PARTITION BY p.purchase_id
             |      ORDER BY t.t_us DESC, t.touch_id DESC) AS rn
             |  FROM p JOIN t ON t.user_id = p.user_id
             |    AND t.t_us < p.p_us
             |    AND t.t_us >= p.p_us - 3600000000)
             |SELECT purchase_id, touch_id, touch_type, gap_us
             |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin)),

    // RFM segmentation (recency / frequency / monetary quintiles — the
    // classic behavioral scoring): per user, hours since their last
    // event (vs the stream's max timestamp), event count, and the value
    // total; each dimension scores 1-5 by ntile with the user_id
    // tie-break, composed as r·100 + f·10 + m. The monetary total is
    // INTEGER CENTS (per-row floor(value·100 + 0.5) — identical IEEE
    // ops on identical doubles both engines, then a BIGINT sum), never
    // an order-dependent double: a last-ulp accumulation difference at
    // a quantile boundary would otherwise flip a user's quintile and
    // cascade into a different rfm code. The ntiles here are exact
    // windows over the PER-USER aggregate (one row per user); at 1e9
    // users the cutoffs would come from approx quantiles instead — the
    // aggregation shape is unchanged.
    QueryDef(
      "q_events_rfm",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = load(s, dir, "events")
        val perUser = ev.groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("last_us"),
            count(lit(1)).as("f"),
            sum(expr("cast(floor(value * cast(100 as double) + " +
              "cast(0.5 as double)) as bigint)")).as("m_cents"))
        val maxTs = perUser.agg(max(col("last_us")).as("max_us"))
        perUser.crossJoin(broadcast(maxTs))
          .withColumn("r_hours",
            expr("(max_us - last_us) div 3600000000L"))
          .withColumn("r_score",
            ntile(5).over(Window.orderBy(col("r_hours"), col("user_id"))))
          .withColumn("f_score",
            ntile(5).over(Window.orderBy(col("f").desc, col("user_id"))))
          .withColumn("m_score",
            ntile(5).over(Window.orderBy(col("m_cents").desc, col("user_id"))))
          .withColumn("rfm",
            col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .select(col("user_id"), col("r_hours"), col("f"), col("m_cents"),
            col("r_score"), col("f_score"), col("m_score"), col("rfm"))
          .orderBy(col("user_id"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, max(epoch_us(ts)) AS last_us,
             |    count(*) AS f,
             |    CAST(sum(CAST(floor(value * CAST(100 AS DOUBLE) +
             |      CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS m_cents
             |  FROM events GROUP BY user_id),
             |x AS (SELECT max(last_us) AS max_us FROM u),
             |sc AS (
             |  SELECT user_id,
             |    (x.max_us - last_us) // 3600000000 AS r_hours, f, m_cents,
             |    CAST(ntile(5) OVER (ORDER BY (x.max_us - last_us)
             |      // 3600000000, user_id) AS INT) AS r_score,
             |    CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS INT)
             |      AS f_score,
             |    CAST(ntile(5) OVER (ORDER BY m_cents DESC, user_id) AS INT)
             |      AS m_score
             |  FROM u, x)
             |SELECT user_id, r_hours, f, m_cents, r_score, f_score, m_score,
             |  r_score * 100 + f_score * 10 + m_score AS rfm
             |FROM sc ORDER BY user_id""".stripMargin)),

    // Holt linear-trend (double exponential) smoothing over per-type
    // hourly counts (Holt 1957 — the EWMA upgrade that tracks a trend;
    // level+trend is the one-step forecast behind capacity dashboards):
    //   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}),
    //   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},  α=0.3, β=0.4.
    // INTEGER-EXACT two-component recursion: state lives in count
    // micro-units, every step is BIGINT arithmetic with truncating
    // division (Spark `div` and DuckDB `//` both truncate toward zero,
    // verified on negative trends), so both engines replay the fold bit
    // for bit. The state is a STRUCT accumulator in Spark `aggregate`;
    // the DuckDB replay carries it as a 2-element LIST instead —
    // DuckDB 1.0's struct literal inside a list_reduce lambda SHADOWS
    // `acc.l` with the just-built `l` field (verified: the `b` field
    // then sees the new level), so named state must not collide and
    // positional state cannot. Standard seed: l₀ = x₀, b₀ = x₁ − x₀,
    // folding from the third point.
    QueryDef(
      "q_events_holt",
      (s, dir) => {
        val hourly = load(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("cnt"))
        hourly.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            transform(sort_array(collect_list(
              struct(col("h"), col("cnt")))), x => x.getField("cnt"))
              .as("cs"))
          .filter(size(col("cs")) >= 2)
          .withColumn("st", expr(
            """aggregate(
              |  slice(cs, 3, greatest(size(cs) - 2, 0)),
              |  named_struct(
              |    'l', element_at(cs, 1) * 1000000L,
              |    'b', (element_at(cs, 2) - element_at(cs, 1)) * 1000000L),
              |  (acc, x) -> named_struct(
              |    'l', (300000L * x * 1000000L
              |          + 700000L * (acc.l + acc.b)) div 1000000L,
              |    'b', (400000L * (((300000L * x * 1000000L
              |            + 700000L * (acc.l + acc.b)) div 1000000L)
              |          - acc.l)
              |          + 600000L * acc.b) div 1000000L)
              |)""".stripMargin))
          .select(col("event_type"), col("n_hours"),
            col("st.l").as("level_micro"), col("st.b").as("trend_micro"),
            (col("st.l") + col("st.b")).as("forecast_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h,
             |    count(*) AS cnt
             |  FROM events GROUP BY event_type, h),
             |srt AS (
             |  SELECT event_type,
             |    CAST(count(*) AS BIGINT) AS n_hours,
             |    list(CAST(cnt AS BIGINT) ORDER BY h) AS cs
             |  FROM hourly GROUP BY event_type),
             |f AS (
             |  SELECT event_type, n_hours,
             |    list_reduce(
             |      list_prepend(
             |        [cs[1] * 1000000, (cs[2] - cs[1]) * 1000000],
             |        list_transform(cs[3:],
             |          x -> [x, CAST(0 AS BIGINT)])),
             |      (acc, x) -> [
             |        (300000 * x[1] * 1000000
             |         + 700000 * (acc[1] + acc[2])) // 1000000,
             |        (400000 * (((300000 * x[1] * 1000000
             |             + 700000 * (acc[1] + acc[2])) // 1000000)
             |           - acc[1])
             |         + 600000 * acc[2]) // 1000000]) AS st
             |  FROM srt WHERE len(cs) >= 2)
             |SELECT event_type, n_hours,
             |  st[1] AS level_micro, st[2] AS trend_micro,
             |  st[1] + st[2] AS forecast_micro
             |FROM f ORDER BY event_type""".stripMargin)),

    // CUSUM change-point detection over per-type hourly counts (Page
    // 1954 — the classic sequential change detector behind traffic-shift
    // alarms): the cumulative sum of deviations from the series mean
    // peaks, in absolute value, at the hour where the level shifts.
    // INTEGER-EXACT throughout: the per-type mean lives in count
    // micro-units via one floor division (sum·1e6 div n — positive, so
    // Spark `div` and DuckDB `//` truncate identically) and the running
    // sum is pure BIGINT, so both engines replay the argmax bit for bit.
    // Scale shape: one hash aggregation to hourly counts (linear
    // shuffle), then per-type windows over a BOUNDED series (≤ hours in
    // the data's span, not event volume) — the window partition is the
    // event_type, never the raw stream.
    QueryDef(
      "q_events_cusum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = load(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("cnt"))
        val wAll = Window.partitionBy(col("event_type"))
        val wRun = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPick = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("cusum_micro")).desc, col("h"))
        hourly
          .withColumn("mean_micro",
            expr("(sum(cnt) over (partition by event_type) * 1000000L)" +
              " div count(*) over (partition by event_type)"))
          .withColumn("n_hours", count(lit(1)).over(wAll))
          .withColumn("cusum_micro",
            sum(col("cnt") * lit(1000000L) - col("mean_micro")).over(wRun))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("n_hours"),
            unix_micros(col("h")).as("change_hour_us"),
            abs(col("cusum_micro")).as("cusum_abs_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h,
             |    count(*) AS cnt
             |  FROM events GROUP BY event_type, h),
             |d AS (
             |  SELECT event_type, h, cnt,
             |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
             |      AS n_hours,
             |    CAST(sum(cnt) OVER (PARTITION BY event_type) * 1000000
             |      AS BIGINT)
             |      // CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
             |      AS mean_micro
             |  FROM hourly),
             |c AS (
             |  SELECT event_type, h, n_hours,
             |    CAST(sum(cnt * 1000000 - mean_micro) OVER (
             |      PARTITION BY event_type ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cusum_micro
             |  FROM d),
             |p AS (
             |  SELECT event_type, h, n_hours, cusum_micro,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY abs(cusum_micro) DESC, h) AS rn
             |  FROM c)
             |SELECT event_type, n_hours, epoch_us(h) AS change_hour_us,
             |  abs(cusum_micro) AS cusum_abs_micro
             |FROM p WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // Hour-of-day seasonal index per event type (the multiplicative
    // seasonal decomposition every traffic-normalization job runs before
    // anomaly thresholds): observed count per (type, hour-of-day) vs the
    // uniform expectation total/24, as an exact floor-division micro
    // ratio idx = cnt·24·1e6 div total (1e6 = flat). One hash
    // aggregation (linear shuffle) to a ≤ 24-rows-per-type profile; the
    // totals join is a broadcast of |event_type| rows.
    QueryDef(
      "q_events_seasonal",
      (s, dir) => {
        val byHod = load(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts")).as("hod"))
          .agg(count(lit(1)).as("cnt"))
        val totals = byHod.groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("total"))
        byHod.join(broadcast(totals), "event_type")
          .withColumn("idx_micro", expr("cnt * 24 * 1000000L div total"))
          .select(col("event_type"), col("hod"), col("cnt"),
            col("idx_micro"))
          .orderBy(col("event_type"), col("hod"))
      },
      Some("""WITH byhod AS (
             |  SELECT event_type, CAST(hour(ts) AS INT) AS hod,
             |    count(*) AS cnt
             |  FROM events GROUP BY event_type, hod),
             |t AS (
             |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total
             |  FROM byhod GROUP BY event_type)
             |SELECT event_type, hod, cnt,
             |  cnt * 24 * 1000000 // total AS idx_micro
             |FROM byhod JOIN t USING (event_type)
             |ORDER BY event_type, hod""".stripMargin)),
  )
}
