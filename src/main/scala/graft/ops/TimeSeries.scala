package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Time-series utilities over event streams.
 *
 * Gap-fill: per-key activity counts with EXPLICIT zero rows for the
 * silent periods inside each key's active span — what downstream
 * trend/anomaly models need (a missing day and a zero day are different
 * signals, and most regressors can't tell them apart from an absent row).
 *
 * Scale shape: counts aggregate to (key, period) — the minimum state —
 * then per-key spans (two values per key) generate the calendar via
 * `sequence` + explode, and a left join against the counts fills zeros.
 * Shuffles touch only per-key-period aggregates, never raw events; the
 * explode amplification is bounded by span length per key, not corpus
 * size.
 */
object TimeSeries {

  /** (key, period, n) — one row per day (or week) of every key's active
    * span, zero-filled where the key was silent. */
  def gapFillCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      period: String = "day"): DataFrame = {
    require(Seq("day", "week").contains(period), s"bad period '$period'")
    // null keys are excluded: they'd aggregate into `daily` but the
    // calendar equi-join can't match null=null, so the null key's whole
    // span would gap-fill to n=0 — asserting silence on active days
    val daily = events
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"),
        to_date(date_trunc(period, col(tsCol))).as("__p"))
      .groupBy(col("__k"), col("__p")).agg(count(lit(1)).as("__n"))
    val step = if (period == "week") expr("INTERVAL 7 DAY")
      else expr("INTERVAL 1 DAY")
    val calendar = daily
      .groupBy(col("__k"))
      .agg(min(col("__p")).as("__lo"), max(col("__p")).as("__hi"))
      .select(col("__k"),
        explode(sequence(col("__lo"), col("__hi"), step)).as("__p"))
    calendar.join(daily, Seq("__k", "__p"), "left")
      .select(col("__k").as(keyCol), col("__p").as("period"),
        coalesce(col("__n"), lit(0L)).as("n"))
  }

  /**
   * Event-type TRANSITION counts — the first-order Markov statistics
   * behind next-event prediction and funnel discovery: for each user's
   * time-ordered event sequence, count every adjacent (from → to) pair
   * corpus-wide. Ties at identical timestamps order by event id, so
   * the sequence (and the counts) are a pure function of the data.
   *
   * Scale shape: ONE window pass partitioned by user (millions of
   * small partitions — the parallelism-friendly direction) computing
   * `lag`, then a hash aggregate whose output is ≤ |event types|² —
   * vocabulary-bounded, map-side combined. No self-join of events.
   */
  def transitionCounts(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      typeCol: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      // null users/types out: Window.partitionBy groups ALL null-user
      // events into ONE partition (a single giant sort task, and the
      // time-interleaving of unrelated anonymous users would count as
      // real transitions); a null TYPE row would both emit a bogus
      // (from, null) pair and break the true A→B adjacency around it
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Windowed EXACT distinct counts (active users per hour) as the
   * two-level aggregate: dedup (window, key) first — a hash aggregate
   * whose map side collapses each key's repeats before the exchange —
   * then count rows per window. This is the shape `count(DISTINCT x)`
   * should lower to at scale: the alternative single-level distinct
   * aggregate shuffles every EVENT to its window's reducer (or pays an
   * Expand), while this shuffles at most one row per (window, key) —
   * and it is exactly the dropDuplicates→count shape Structured
   * Streaming can run incrementally. The sketch tier for unbounded key
   * domains is a bounded distinct sketch (see `Profile.numericProfile`'s
   * KMV tier, or `approx_count_distinct` where cross-engine replay is
   * not needed); this is the exact tier.
   */
  def windowDistinct(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      truncUnit: String = "hour"): DataFrame =
    events
      // null-ts rows have no window (the Spark window() convention —
      // and the behavior a stream twin would show anyway); grouping
      // them under w=NULL would also silently diverge from any oracle
      // that equi-joins on w (NULL never joins NULL) — r15 gate audit
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(date_trunc(truncUnit, col(tsCol)).as("w"), col(keyCol).as("k"))
      .groupBy(col("w"), col("k")).agg(count(lit(1)).as("__n"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("__n")).as("n_events"))

  /**
   * Windowed distinct counts, KMV sketch tier — the bounded-state twin
   * of [[windowDistinct]] for UNBOUNDED key domains at 100 TB: the
   * exact tier's shuffle carries one row per (window, key), which for
   * random ids IS the corpus; this tier's per-window state is ≤
   * `sketchK` longs regardless of key cardinality, one shuffle on the
   * window only, σ ≈ 1/√(sketchK−2) relative error (and EXACT below
   * sketchK distincts per window — see
   * [[graft.functions.KmvDistinct]]).
   *
   * Determinism/gate contract: the retained bottom-k md5 set is a pure
   * function of each window's key SET — bit-deterministic at any
   * layout and strictly DuckDB-replayable per group (`row_number()
   * OVER (PARTITION BY w ORDER BY h) ≤ k`). `keyCol` must render
   * identically as a string in both engines (integers and strings do —
   * the kmvHash60 convention).
   *
   * Streaming-safe like the exact tier: the aggregate is mergeable, so
   * micro-batch partials combine exactly like map-side partials.
   */
  def windowDistinctApprox(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      truncUnit: String = "hour",
      sketchK: Int = 1024): DataFrame =
    events
      // null-ts drop: same contract as the exact twin (see above)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      // hash in the codegen projection; the interpreted aggregate child
      // stays a bare column ref (the corrExact/numericProfile discipline)
      .select(date_trunc(truncUnit, col(tsCol)).as("w"),
        graft.functions.KmvDistinct.kmvHash60(col(keyCol)).as("__h"))
      .groupBy(col("w"))
      .agg(graft.functions.KmvDistinct.kmv_distinct(col("__h"), sketchK)
          .as("n_distinct_est"),
        count(lit(1)).as("n_events"))

  /**
   * Trailing moving average of a measure over the last `windowRows`
   * events per key (event-count frame, not time frame — the smoothing
   * most monitoring/feature pipelines use).
   *
   * Exactness: the measure sums as ROUNDED INTEGER cents inside the
   * window frame (order-independent, engine-exact); the single division
   * back to currency happens once per output row, so results are
   * bit-stable and SQL-replayable. Frame order is (ts, idCol) — the id
   * tiebreak makes same-timestamp rows deterministic. Null measures
   * carry SQL avg semantics (excluded from both sum and denominator).
   *
   * Scale shape: ONE shuffle by key, one sort within partitions, a
   * bounded running frame — the canonical window op; state per task is
   * the frame buffer, never the corpus.
   */
  def movingAverage(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      windowRows: Int): DataFrame = {
    require(windowRows >= 1, "windowRows must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(windowRows - 1), 0)
    events
      .select(col(keyCol), col(tsCol), col(idCol),
        graft.functions.ColumnMath.roundHalfUp(col(valCol) * 100).cast("long").as("__cents"))
      .select(col(keyCol), col(idCol),
        // count the NON-NULL measures (SQL avg semantics): count(1)
        // would let a null-valued event contribute 0 to the sum while
        // inflating the denominator, biasing the average toward zero
        (sum(col("__cents")).over(w).cast("double") /
          (lit(100.0) * count(col("__cents")).over(w))).as("mavg"))
      .select(col(keyCol), col(idCol), round(col("mavg"), 4).as("mavg"))
  }
}
