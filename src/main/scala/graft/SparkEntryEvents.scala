package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Filters
import graft.ops.{Dedup, TextAnalysis, VectorSearch}
import graft.GateSupport._

/**
 * Event/stream gates: windowed aggregation, sessionization, funnels,
 * retention, gap-fill, anomaly signals, streaming-shaped twins.
 *
 * One gate domain of [[SparkEntry]] (assembled there); every entry
 * keeps a matching oracle in this file so a query and its DuckDB
 * replay are reviewed together.
 */
private[graft] object SparkEntryEvents {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- trending: top-3 event types per 5-minute tumbling window via
    // the bounded-heap aggregate over the (window, type) count table —
    // no rank() window sort; per-window state is k rows ----
    "events_trending" -> ((s, dir) =>
      graft.streaming.EventsStream.trendingTypes(events(s, dir), 3)),

    // ---- time series: trailing 5-event moving average per user (cents-
    // exact window sums, one shuffle by key, bounded frame) ----
    "events_moving_avg" -> ((s, dir) =>
      graft.ops.TimeSeries.movingAverage(
        events(s, dir), "user_id", "ts", "event_id", "value", 5)),

    // ---- relational: pivot with EXPLICIT values (no driver-side
    // distinct pass) — users × event-type count matrix ----
    "events_pivot" -> ((s, dir) =>
      events(s, dir).groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1))).na.fill(0L)),

    // ---- events: per-user daily counts with zero-filled gaps ----
    "events_gapfill" -> ((s, dir) =>
      graft.ops.TimeSeries.gapFillCounts(events(s, dir), "user_id", "ts")),

    // ---- events: ordered funnel with first-match semantics ----
    "events_funnel" -> ((s, dir) =>
      graft.ops.Funnel.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))),

    // ---- events: cohort retention (first-active-day cohorts) ----
    "events_retention" -> ((s, dir) =>
      graft.ops.Cohorts.retention(events(s, dir), "user_id", "ts")
        .withColumnRenamed("offset", "day_offset")),

    // ---- events: tumbling-window aggregation (streaming-shaped, batch) ----
    "events_window_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("minute", col("ts")).as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long")).cast("double")
            .divide(100.0).as("sum_value"))),

    // ---- sequence mining: first-order event-type transition counts
    // (one per-user window pass + vocabulary-bounded aggregate) ----
    "events_transitions" -> ((s, dir) =>
      graft.ops.TimeSeries.transitionCounts(events(s, dir),
        "ts", "user_id", "event_type", "event_id")),

    // ---- semi-structured: JSON props parsed IN-SCAN (codegen
    // get_json_object — no UDF, no pre-materialization) and aggregated
    // per event_type with exact integer stats. try_cast, not cast: under
    // ANSI (Spark 4 default) a plain cast THROWS on the first
    // non-integer '$.k' — one dirty props row would kill the whole job
    // instead of being skipped (r13 gate audit) ----
    "events_json_props" -> ((s, dir) => {
      val k = expr("try_cast(get_json_object(props, '$.k') AS LONG)")
      events(s, dir)
        .select(col("event_type"), k.as("__k"))
        .filter(col("__k").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("__k")).as("sum_k"),
          min(col("__k")).as("min_k"), max(col("__k")).as("max_k"))
    }),

    // ---- exact windowed distinct (two-level aggregate; the shape
    // count(DISTINCT) should lower to — see TimeSeries.windowDistinct) ----
    "events_window_distinct" -> ((s, dir) =>
      graft.ops.TimeSeries.windowDistinct(events(s, dir), "ts", "user_id")),

    // ---- windowed distinct, KMV sketch tier: per-window state ≤ k
    // longs for UNBOUNDED key domains (the exact twin shuffles one row
    // per (window, key) — at 100 TB of random ids that IS the corpus).
    // k=64 so the gate exercises BOTH arms: sf0.01 windows hold 4–28
    // distinct users (exact arm), sf0.1 windows 98–166 (estimate arm);
    // DuckDB replays the per-group bottom-k and the integer estimate
    // bit-for-bit either way ----
    "events_window_distinct_approx" -> ((s, dir) =>
      graft.ops.TimeSeries.windowDistinctApprox(events(s, dir), "ts",
        "user_id", sketchK = 64)),

    // ---- events: SLIDING (hopping) windows — 2-minute windows every
    // minute, so each event lands in exactly two epoch-aligned windows;
    // the overlap factor is bounded by width/slide, not corpus size ----
    "events_sliding_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "2 minutes", "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long")).cast("double")
            .divide(100.0).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))),

    // ---- events: sessionization-lite — per-user event counts + value ----
    "events_per_user" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          sum(graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long")).cast("double")
            .divide(100.0).as("sum_value"))),

    // ---- events: stream-static broadcast enrichment (batch twin of the
    // streaming path — stream-vs-batch equality pinned in StreamingSpec;
    // the dimension broadcasts, the event stream never shuffles) ----
    "events_enrich" -> ((s, dir) =>
      graft.streaming.EventsStream.enrich(
          events(s, dir), t(s, dir, "customer")
            .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
          "user_id", "inner")
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long")).cast("double")
            .divide(100.0).as("sum_value"))),

    // ---- streaming-shaped: gap sessions via the NATIVE session_window
    // (declarative twin of the flatMapGroupsWithState sessionizer; same
    // island semantics, watermark-evictable state on a stream) ----
    "events_sessions" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"),
          (sum(graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long")) / 100.0).as("total_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("total_value"))),

    // ---- events: per-user z-score anomaly signal (exact moments) ----
    "events_zscore" -> ((s, dir) =>
      graft.ops.Profile.zscores(events(s, dir), "value", "user_id", "event_id")
        .select(col("event_id"), col("user_id"), round(col("z"), 4).as("z"))),

    // ---- events: robust MAD outlier flags (|x − med| > 3·MAD decided
    // on exact integers via the doubled-unit trick; the heavy-tail-safe
    // twin of events_zscore) ----
    "events_mad" -> ((s, dir) =>
      graft.ops.Profile.madOutliers(events(s, dir), "value", "event_id")),

    // ---- streaming-shaped: gap sessionization via flatMapGroupsWithState.
    // The gate feeds PRE-SCALED integer cents as the value: the state's
    // total accumulates doubles in ts order while DuckDB's sum picks its
    // own order, and a raw-double round(·,4) projection could land a
    // session on opposite sides of a rounding boundary (the
    // events_sessions cents discipline, applied to the stateful twin —
    // r13 gate audit). Integer-valued doubles sum exactly in any order ----
    "streaming_sessionize" -> ((s, dir) =>
      graft.streaming.EventsStream.sessionize(
          events(s, dir).withColumn("value", graft.functions.ColumnMath.roundHalfUp(col("value") * 100)),
          gapMs = 6 * 3600 * 1000L)
        .toDF().select(col("user_id"), col("n_events"),
          col("total_value").cast("long").as("total_cents"))),

    // ---- streaming heavy hitters (batch-mode single-epoch semantics,
    // like the other streaming gates; exact regime ⇒ SQL-replayable) ----
    "streaming_heavy_hitters" -> ((s, dir) =>
      graft.streaming.EventsStream.heavyHittersStream(events(s, dir),
        "user_id", capacity = 8192, topN = 5, windowDuration = "1 hour"))

  )

  def oracleSql: Map[String, String] = Map(
    // Gap sessionization is deterministic relational logic: lag-gap flag,
    // running-sum session id, per-session aggregate — an exact SQL oracle
    // for the flatMapGroupsWithState operator (single-epoch semantics).
    // Same island detection; session_start = the island's first event.
    "events_sessions" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
        |  -- ts IS NOT NULL: Spark's session_window silently drops
        |  -- null-ts rows (TimeWindowing inserts an IsNotNull filter);
        |  -- without the mirror a null-ts event joins the user's last
        |  -- session here (r13 gate audit)
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  count(*)::BIGINT AS n_events,
        |  sum(round(value * 100)::BIGINT) / 100.0 AS total_value
        |FROM g GROUP BY user_id, sess""".stripMargin,

    // z rearranged to one integer numerator over one integer-rooted
    // denominator — exact HUGEINT moments, zero-variance guard.
    // `+ 0.0` normalizes IEEE -0.0: DuckDB's round keeps the sign of a
    // tiny negative quotient (round(-1e-6::DOUBLE, 4) = -0.0) while
    // Spark's BigDecimal HALF_UP round returns +0.0 — first observed at
    // sf0.1, where one user's z lands exactly there (r9 census).
    "events_zscore" ->
      """WITH s AS (
        |  SELECT user_id, count(value)::HUGEINT AS n,
        |    sum(round(value * 100)::BIGINT)::HUGEINT AS sv,
        |    sum(round(value * 100)::BIGINT::HUGEINT
        |      * round(value * 100)::BIGINT::HUGEINT) AS ss
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN (s.n * s.ss - s.sv * s.sv) > 0 THEN
        |    round((s.n * round(e.value * 100)::BIGINT - s.sv)::DOUBLE /
        |      sqrt((s.n * s.ss - s.sv * s.sv)::DOUBLE), 4) + 0.0
        |  ELSE NULL END AS z
        |FROM events e JOIN s USING (user_id)""".stripMargin,

    // Doubled-unit MAD replay: quantile_cont of doubled integers is the
    // exact integer lo+hi (interpolation at .5 over scaled longs), so
    // med2/m2 round back exactly and the flag is an integer comparison.
    "events_mad" ->
      """WITH s AS (SELECT event_id, round(value * 100)::BIGINT AS s FROM events),
        |m AS (SELECT round(quantile_cont(s * 2, 0.5))::BIGINT AS med2 FROM s),
        |d AS (SELECT event_id, s, abs(s * 2 - med2) AS d FROM s, m),
        |md AS (SELECT round(quantile_cont(d * 2, 0.5))::BIGINT AS m2 FROM d)
        |SELECT event_id, s AS value_scaled, (d * 2 > 3 * m2) AS is_outlier
        |FROM d, md""".stripMargin,

    "streaming_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT user_id, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM m)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS total_cents
        |FROM g GROUP BY user_id, sess""".stripMargin,

    // ts IS NOT NULL: Cohorts.retention drops null periods
    // (collect_set skips nulls); the bare DISTINCT kept (user, NULL)
    // rows as a phantom offset group (r13 gate audit)
    "events_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS p
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT user_id, min(p) AS p0 FROM active GROUP BY user_id)
        |SELECT p0 AS cohort, datediff('day', p0, p) AS day_offset,
        |  count(*) AS n_users
        |FROM active JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // Exact regime ⇒ per-hour exact top-5 with the sketch's string
    // tie-break; epoch-aligned tumbling hour = date_trunc.
    "streaming_heavy_hitters" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  row_number() OVER (PARTITION BY date_trunc('hour', ts)
        |    ORDER BY count(*) DESC, user_id::VARCHAR) AS rank,
        |  user_id::VARCHAR AS value, count(*) AS est_count
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1, user_id
        |QUALIFY rank <= 5""".stripMargin,

    // Same lag-over-(user, ts, id) replay; counts are type²-bounded.
    // user/type IS NOT NULL mirrors transitionCounts' guards; ts NULLS
    // FIRST mirrors Spark's default null ordering in the lag window
    // (DuckDB defaults NULLS LAST — opposite sort ends, r13 gate audit)
    "events_transitions" ->
      """WITH m AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts NULLS FIRST, event_id) AS prev
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT prev AS from_type, event_type AS to_type, count(*) AS n
        |FROM m WHERE prev IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    // Mirrors Spark's try_cast(string AS LONG): integer strings only
    // (ANSI trims whitespace; '12.7' and 'abc' → NULL → row skipped).
    // DuckDB's own TRY_CAST would diverge — it parses '12.7' as numeric
    // and ROUNDS to 13 — so the integer check is an explicit regex.
    "events_json_props" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')),
        |                             '^[+-]?[0-9]+$')
        |         THEN CAST(trim(json_extract_string(props, '$.k')) AS BIGINT)
        |    END AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  sum(k)::BIGINT AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM x WHERE k IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    "events_window_distinct" ->
      """SELECT date_trunc('hour', ts) AS w,
        |  count(DISTINCT user_id) AS n_distinct,
        |  count(*) AS n_events
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // Per-group KMV replay: same md5-prefix hash of the id's decimal
    // rendering, bottom-64 per window via row_number, same exact-integer
    // (k−1)·2⁶⁰/h_k estimate (HUGEINT // ≡ BigInt floor division); under
    // 64 distinct hashes the count itself is the answer in both engines.
    "events_window_distinct_approx" ->
      """WITH h AS (
        |  SELECT DISTINCT date_trunc('hour', ts) AS w,
        |    CAST('0x' || substring(md5(user_id::VARCHAR), 1, 15) AS BIGINT) AS h
        |  -- ts IS NOT NULL in both arms: the engine drops null-ts rows
        |  -- (no window), and a w=NULL group would silently vanish in
        |  -- the est/ev equi-join below anyway (r15 gate audit)
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (
        |  SELECT w, h, row_number() OVER (PARTITION BY w ORDER BY h) AS rn
        |  FROM h),
        |est AS (
        |  SELECT w,
        |    CASE WHEN count(*) < 64 THEN count(*)
        |      ELSE ((63::HUGEINT << 60) //
        |            greatest(max(CASE WHEN rn = 64 THEN h END), 1))::BIGINT
        |    END AS n_distinct_est
        |  FROM b WHERE rn <= 64 GROUP BY w),
        |ev AS (
        |  SELECT date_trunc('hour', ts) AS w, count(*) AS n_events
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1)
        |SELECT w, n_distinct_est, n_events
        |FROM est JOIN ev USING (w)""".stripMargin,

    "events_window_agg" ->
      """SELECT date_trunc('minute', ts) AS w, event_type,
        |  count(*) AS n,
        |  sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    // A 2-min/1-min hop assigns each event to its truncated minute and
    // the minute before — epoch alignment matches Spark's window().
    "events_sliding_agg" ->
      """WITH w AS (
        |  SELECT unnest([date_trunc('minute', ts),
        |                 date_trunc('minute', ts) - INTERVAL 1 MINUTE]) AS w_start,
        |    event_type, value
        |  -- ts IS NOT NULL: Spark's window() drops null-ts rows; the
        |  -- unnest would otherwise emit TWO NULL-w_start rows per
        |  -- null-ts event (r13 gate audit)
        |  FROM events WHERE ts IS NOT NULL)
        |SELECT w_start, event_type, count(*) AS n,
        |  sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,

    "events_per_user" ->
      """SELECT user_id, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
        |FROM events
        |GROUP BY user_id""".stripMargin,

    "events_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    "events_pivot" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
        |FROM events GROUP BY user_id""".stripMargin,

    // Same calendar expansion: per-key span -> generate_series -> left
    // join fills silent days with explicit zeros. NULL keys are excluded
    // like the operator does (gapFillCounts filters them: DuckDB would
    // otherwise group the NULL key and emit a calendar the equi-join can
    // never match, i.e. an all-zero phantom series).
    "events_gapfill" ->
      """WITH d AS (
        |  SELECT user_id, date_trunc('day', ts)::DATE AS p, count(*) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT user_id, min(p) AS lo, max(p) AS hi FROM d GROUP BY 1),
        |cal AS (
        |  SELECT user_id,
        |    unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |      INTERVAL 1 DAY))::DATE AS p
        |  FROM s)
        |SELECT cal.user_id, cal.p AS period, coalesce(d.n, 0)::BIGINT AS n
        |FROM cal LEFT JOIN d ON cal.user_id = d.user_id AND cal.p = d.p""".stripMargin,

    // Stage-by-stage conditional-min replay of the first-match funnel.
    "events_funnel" ->
      // ts IS NOT NULL in s0: Funnel.funnel drops null-ts events up
      // front; a user whose every signup has null ts would otherwise
      // count as reaching stage 0 here (min over all-null = NULL) while
      // Spark excludes them (r13 gate audit). Later stages need no
      // guard: `e.ts > t` is never true for a null ts.
      """WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'signup' AND ts IS NOT NULL GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s0 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        |SELECT 0 AS stage, 'signup' AS step, count(*) AS n_users FROM s0
        |UNION ALL SELECT 1, 'view', count(*) FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3""".stripMargin,

    // time_bucket shares Spark window()'s epoch alignment; QUALIFY
    // replays the (n DESC, type ASC) bounded top-3.
    "events_trending" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |  row_number() OVER (PARTITION BY time_bucket(INTERVAL '5 minutes', ts)
        |    ORDER BY count(*) DESC, event_type) AS rank,
        |  event_type, count(*) AS n
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, event_type
        |QUALIFY rank <= 3""".stripMargin,

    // Same cents-integer window sum, same (ts, event_id) frame order,
    // one division at the end. count over the measure (not *): avg
    // semantics over possibly-null values, matching movingAverage.
    "events_moving_avg" ->
      """SELECT user_id, event_id,
        |  round(sum(round(value * 100)::BIGINT) OVER w / (100.0 *
        |    count(round(value * 100)::BIGINT) OVER w), 4) AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin

  )
}
