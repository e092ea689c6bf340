package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillCounts zero-fills the silent days inside each key's span") {
    val ev = withLogLevel(Seq(
      (1L, ts("2024-03-01 10:00:00")),
      (1L, ts("2024-03-01 11:00:00")),
      (1L, ts("2024-03-04 09:00:00")),   // 2nd+3rd are silent
      (2L, ts("2024-03-02 08:00:00"))    // single-day span
    ).toDF("k", "t"))
    val r = TimeSeries.gapFillCounts(ev, "k", "t")
      .collect().map(x => (x.getLong(0), x.getDate(1).toString, x.getLong(2)))
      .toSet
    assert(r === Set(
      (1L, "2024-03-01", 2L),
      (1L, "2024-03-02", 0L),
      (1L, "2024-03-03", 0L),
      (1L, "2024-03-04", 1L),
      (2L, "2024-03-02", 1L)))
  }

  test("transitionCounts drops null users and null types (r12)") {
    // null users previously merged into ONE window partition (bogus
    // cross-user transitions between unrelated anonymous events, plus a
    // single giant sort task); a null TYPE emitted a (from, null) pair.
    // Both now filter: transitions are counted over the null-free
    // subsequence per real user.
    val ev = withLogLevel(Seq(
      (Some(1L), ts("2024-03-01 10:00:00"), 1L, Some("A")),
      (Some(1L), ts("2024-03-01 11:00:00"), 2L, None: Option[String]),
      (Some(1L), ts("2024-03-01 12:00:00"), 3L, Some("B")),
      (None: Option[Long], ts("2024-03-01 10:30:00"), 4L, Some("A")),
      (None: Option[Long], ts("2024-03-01 10:40:00"), 5L, Some("B"))
    ).toDF("u", "t", "id", "typ"))
    val r = TimeSeries.transitionCounts(ev, "t", "u", "typ", "id")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(r === Set(("A", "B", 1L)), s"got $r")
  }

  test("weekly period steps by 7 days") {
    val ev = withLogLevel(Seq(
      (1L, ts("2024-03-04 10:00:00")),    // a Monday
      (1L, ts("2024-03-25 10:00:00"))     // 3 weeks later
    ).toDF("k", "t"))
    val r = TimeSeries.gapFillCounts(ev, "k", "t", period = "week")
      .collect().map(x => x.getDate(1).toString -> x.getLong(2)).toMap
    assert(r === Map(
      "2024-03-04" -> 1L, "2024-03-11" -> 0L,
      "2024-03-18" -> 0L, "2024-03-25" -> 1L))
    intercept[IllegalArgumentException](
      TimeSeries.gapFillCounts(ev, "k", "t", period = "hour"))
  }

  test("shuffles touch per-key-period aggregates, never raw events") {
    val ev = Seq((1L, ts("2024-03-01 10:00:00"))).toDF("k", "t")
    val p = TimeSeries.gapFillCounts(ev, "k", "t")
      .queryExecution.executedPlan.toString
    // the first exchange must sit above the partial count aggregate
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("movingAverage: trailing frame, cents-exact, id tiebreak") {
    import java.sql.Timestamp
    val df = withLogLevel(Seq(
      (1L, Timestamp.valueOf("2026-01-01 00:00:00"), 10L, 1.00),
      (1L, Timestamp.valueOf("2026-01-01 00:00:01"), 11L, 2.00),
      (1L, Timestamp.valueOf("2026-01-01 00:00:01"), 12L, 4.00), // same ts: id order
      (1L, Timestamp.valueOf("2026-01-01 00:00:02"), 13L, 8.00),
      (2L, Timestamp.valueOf("2026-01-01 00:00:00"), 20L, 5.00)
    ).toDF("user_id", "ts", "event_id", "value"))
    val r = graft.ops.TimeSeries
      .movingAverage(df, "user_id", "ts", "event_id", "value", 2)
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(r === Map(10L -> 1.0, 11L -> 1.5, 12L -> 3.0, 13L -> 6.0, 20L -> 5.0))
  }
}
