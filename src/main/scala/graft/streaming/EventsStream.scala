package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming operators over the events stream (schema of
 * testdata events.parquet). Every transform here works unchanged on a
 * batch DataFrame or a readStream DataFrame — declare once, run either
 * way; watermarks bound state at scale.
 */
object EventsStream {

  /** events schema as read from parquet (ts surfaced as TimestampType). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a file-based stream over an events directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling/sliding window counts + sums with a watermark: the
    * streaming form of SparkEntry's events_window_agg. */
  def windowedAgg(
      events: DataFrame,
      windowDuration: String = "1 minute",
      slideDuration: String = "1 minute",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration, slideDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming exact-dedup by event_id within the watermark horizon —
    * the streaming tier of the dedup family (identical events arriving
    * twice emit once). `dropDuplicatesWithinWatermark` is load-bearing:
    * plain `dropDuplicates("event_id")` only evicts state when the
    * event-time column is part of the KEY, so with id-only keys its
    * state grows one entry per distinct id FOREVER despite the
    * watermark — the WithinWatermark variant is the one that actually
    * expires state at the horizon. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class Session(
      user_id: Long,
      n_events: Long,
      total_value: Double,
      start_ts: Timestamp,
      end_ts: Timestamp)

  private case class SessionState(
      n: Long, total: Double, start: Long, last: Long)

  /**
   * Gap-based sessionization via flatMapGroupsWithState: a session closes
   * after `gapMs` of user inactivity. Custom state the windowed operators
   * can't express — KeyValueGroupedDataset state API.
   *
   * Note: this variant emits every session seen in the processed data and
   * clears state afterwards — exact for batch / single-epoch
   * (AvailableNow) runs. A continuously-running stream wanting sessions
   * held open ACROSS micro-batches should keep the state (drop
   * `state.remove()`) and close sessions via GroupStateTimeout instead.
   */
  def sessionize(
      events: Dataset[org.apache.spark.sql.Row],
      gapMs: Long = 5 * 60 * 1000L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          // batch mode: all rows at once; emit every closed session + final.
          // Times tracked in MICROSECONDS — Timestamp.getTime truncates to
          // ms, which would disagree with micro-precision engines (and the
          // native session_window operator) on borderline gaps.
          // floorDiv, not `/`: getTime on a pre-epoch timestamp is
          // negative with the sub-second part folded in (−500 ms for
          // 1969-12-31T23:59:59.500), and truncating division would
          // yield +500000 µs instead of −500000 — breaking ordering,
          // gap math, and the fromUs round-trip for pre-1970 data
          def us(ts: Timestamp): Long =
            Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
          def fromUs(u: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
            t
          }
          val gapUs = gapMs * 1000L
          val sorted = rows.toSeq.sortBy(r => us(r._2))
          val sessions = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { case (_, ts, v) =>
            val t = us(ts)
            cur match {
              case Some(s) if t - s.last <= gapUs =>
                cur = Some(SessionState(s.n + 1, s.total + v, s.start, t))
              case Some(s) =>
                sessions += Session(userId, s.n, s.total,
                  fromUs(s.start), fromUs(s.last))
                cur = Some(SessionState(1, v, t, t))
              case None =>
                cur = Some(SessionState(1, v, t, t))
            }
          }
          cur.foreach { s =>
            sessions += Session(userId, s.n, s.total,
              fromUs(s.start), fromUs(s.last))
          }
          state.remove()
          sessions.iterator
      }
  }

  /** Streaming NEAR-dup suppression for a document stream: drop any doc
    * whose SimHash signature was already seen within the watermark
    * horizon (token-permutation/case variants share a signature). The
    * streaming tier of the dedup family; state = one signature per
    * horizon, bounded by the watermark. `tsCol` must exist on the
    * stream for the watermark. */
  def dedupBySimhash(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      // coalesce BEFORE hashing: simhash64 propagates null for a null
      // token array, and dropDuplicatesWithinWatermark treats null keys
      // as one shared key — every distinct NULL-text doc in the horizon
      // would silently collapse into the first. Normalizing null to ''
      // makes the grouping EXPLICIT and deterministic: all no-text docs
      // are mutual near-dups (of each other and of ''-text docs), the
      // stated signature semantics rather than a null-key accident.
      .withColumn("__sig", graft.functions.HashFunctions.simhash64(
        split(lower(coalesce(col(textCol), lit(""))), " ")))
      .withWatermark(tsCol, watermark)
      // WithinWatermark, for the same state-eviction reason as
      // [[dedupStream]]: signature-only keys never expire otherwise
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")

  /**
   * Stream-stream interval join — attach to each left row the right rows
   * of the same key whose `rightTs` falls in [leftTs − lookback, leftTs]
   * (attribution: "purchases with the clicks that preceded them by ≤ 30
   * minutes"). Both sides are watermarked, and the time-range predicate
   * is exactly what Structured Streaming needs to BOUND the join state:
   * right rows age out of state once the left watermark passes
   * rightTs + lookback — without the interval bound, stream-stream join
   * state grows forever. Works identically on batch frames (watermarks
   * are no-ops there).
   *
   * Column names must not collide (pre-rename the sides); `key` is the
   * equi-join column present on both.
   */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val collisions = (left.columns.toSet - key)
      .intersect(right.columns.toSet - key)
    require(collisions.isEmpty,
      s"rename colliding columns before the interval join: $collisions")
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
      .drop(r(key))
  }

  /**
   * Stream-static enrichment: attach dimension attributes to each event
   * via a BROADCAST join against a static (batch) table — the canonical
   * Structured Streaming enrich pattern. Stream-static joins are
   * stateless (no watermark, no join state: each micro-batch probes the
   * dimension map-side), so this composes freely before any windowed
   * aggregate; the broadcast keeps the stream side from ever shuffling.
   * At 100 TB-of-events scale the dimension is the small side by
   * definition — for a dimension too big to broadcast, pre-bucket both
   * sides instead (see BucketedCorpus).
   */
  def enrich(
      events: DataFrame,
      dim: DataFrame,
      key: String,
      joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

  /** Rate-of-events per user over a sliding window (streaming-safe). */
  def perUserRates(
      events: DataFrame,
      windowDuration: String = "5 minutes",
      slideDuration: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration, slideDuration), col("user_id"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("event_type")).as("n_types"))

  /**
   * Streaming heavy hitters — the Misra–Gries sketch
   * ([[graft.functions.MisraGries]]) as a per-window STREAMING
   * aggregate: top values of an unbounded-cardinality column (user
   * ids, URLs) with state bounded at `capacity` counters per open
   * window regardless of stream volume — the sketch contract carries
   * over verbatim because the aggregate is mergeable (micro-batch
   * partials merge exactly like map-side partials). In the exact
   * regime (distinct ≤ capacity) the streamed result is bit-equal to
   * the batch [[graft.ops.Profile.heavyHitters]] per window
   * (spec-pinned); above it, every true heavy hitter with frequency
   * > n/(capacity+1) survives with bounded undercount.
   */
  def heavyHittersStream(
      events: DataFrame,
      valueCol: String,
      capacity: Int,
      topN: Int,
      windowDuration: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(topN >= 1 && topN <= capacity, "need 1 <= topN <= capacity")
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration))
      .agg(graft.functions.MisraGries.mg_sketch(
        col(valueCol).cast("string"), capacity).as("__hh"))
      .select(col("window"), posexplode(col("__hh")).as(Seq("__r", "__e")))
      .filter(col("__r") < topN)
      .select(col("window").getField("start").as("window_start"),
        (col("__r") + 1).cast("long").as("rank"),
        col("__e").getField("value").as("value"),
        col("__e").getField("count").as("est_count"))
  }

  /**
   * Trending: top-k event types per tumbling window, via the bounded-heap
   * `topk_rows` aggregate OVER the (window, type) count table — the
   * per-window state is k rows, never the type cardinality, and there is
   * no rank() window function (which would sort every window's full type
   * list). Works batch or streaming: the second stateful aggregate
   * re-windows ON the first's window column — the chained-time-window
   * pattern Spark's global-watermark checker accepts in append mode
   * (3.4+), pinned stream-vs-batch-equal in StreamingSpec.
   * Deterministic ties: (count DESC, type ASC).
   */
  def trendingTypes(
      events: DataFrame,
      k: Int,
      windowDuration: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // second stateful agg re-windows ON the window column — the chained-
    // time-window pattern Spark's watermark checker accepts (3.4+)
    counts
      .groupBy(window(col("window"), windowDuration))
      .agg(graft.functions.TopKAggregate.topk_rows(
        struct(col("n"), col("event_type")), k).as("__top"))
      .select(col("window"), posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(col("window").getField("start").as("window_start"),
        (col("__r") + 1).cast("long").as("rank"),
        col("__e").getField("event_type").as("event_type"),
        col("__e").getField("n").as("n"))
  }
}
