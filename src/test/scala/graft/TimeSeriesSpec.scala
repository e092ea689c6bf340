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

  test("windowDistinctApprox: exact below k, within 3σ above, layout-invariant") {
    // window A: 3 distinct keys < k=64 ⇒ the estimate IS the count;
    // window B: 2000 distinct keys ≫ k ⇒ estimate arm, σ ≈ 1/√62 ≈ 13%
    val a = Seq.tabulate(10)(i =>
      (ts("2024-03-01 10:05:00"), (i % 3).toLong))
    val b = Seq.tabulate(2000)(i =>
      (ts("2024-03-01 11:30:00"), 1000L + i))
    val ev = withLogLevel((a ++ b).toDF("t", "k"))
    def run(parts: Int) = TimeSeries.windowDistinctApprox(
        ev.repartition(parts), "t", "k", sketchK = 64)
      .collect().map(r => (r.getTimestamp(0).toString,
        r.getLong(1), r.getLong(2))).sortBy(_._1)
    val got = run(1)
    assert(got.length === 2)
    assert(got(0) === (("2024-03-01 10:00:00.0", 3L, 10L)),
      "below-k window must be exact")
    val (_, est, n) = got(1)
    assert(n === 2000L)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.39,
      s"estimate $est vs true 2000 outside 3σ")
    // the bottom-k set is a pure function of each window's key set
    assert(run(7).toSeq === got.toSeq,
      "KMV must be invariant to partition layout")
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
