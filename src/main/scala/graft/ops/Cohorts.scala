package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cohort retention — the standard activity-analytics rollup: bucket every
 * user by their first-active period (the cohort), then count how many of
 * each cohort return k periods later.
 *
 * Scale shape: activity first collapses to distinct (user, period) pairs
 * (one shuffle keyed by user — at 100 TB this is the big one, and it is
 * also the MINIMUM possible: retention is per-user state). The per-user
 * first period then comes from a window over that same user partitioning
 * (no second exchange — Catalyst reuses the hash partitioning), and the
 * final (cohort, offset) rollup aggregates a frame already reduced to
 * user-periods, orders of magnitude smaller than raw events.
 */
object Cohorts {

  /**
   * @param events   activity rows
   * @param userCol  user identity column
   * @param tsCol    event-time column (timestamp)
   * @param period   truncation unit for cohorts/offsets: "day" or "week"
   * @return (cohort, offset, n_users): users of cohort `cohort` active
   *         `offset` periods after their first period (offset 0 = the
   *         cohort size itself)
   */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      period: String = "day"): DataFrame = {
    require(Seq("day", "week").contains(period), s"bad period '$period'")
    val perDays = if (period == "week") 7 else 1

    // ONE user-keyed exchange: collect_set partially aggregates each
    // user's distinct active periods map-side, and the first period is
    // array_min of the set. The previous distinct() + window shape
    // actually shuffled TWICE — distinct partitions by (__u, __p),
    // which does not satisfy the window's clustering on __u alone, so
    // Catalyst inserted a second full exchange despite the comment
    // claiming reuse. Per-user state is the user's active-period count
    // (calendar-bounded), never the event count. Null-ts rows drop
    // (collect_set skips nulls) — they carried no usable offset anyway.
    val out = events
      // null users out (the TimeSeries.gapFillCounts convention): a
      // groupBy key of null merges EVERY anonymous event into one
      // phantom "user" that lands in the earliest null-activity cohort
      // with near-perfect retention at every offset
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"),
        to_date(date_trunc(period, col(tsCol))).as("__p"))
      .groupBy(col("__u")).agg(collect_set(col("__p")).as("__ps"))
      .select(array_min(col("__ps")).as("__p0"), explode(col("__ps")).as("__p"))
    out
      .groupBy(col("__p0").as("cohort"),
        (datediff(col("__p"), col("__p0")) / perDays).cast("long").as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
