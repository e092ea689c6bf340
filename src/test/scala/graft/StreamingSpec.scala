package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStream

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  /** events at sf0.001, ts as proper timestamps, written to a stream dir. */
  private lazy val streamDir: String = withLogLevel {
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    val dir = Files.createTempDirectory("graft-stream").toString
    raw.coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming windowed agg matches the batch computation") {
    // complete mode: append would hold back windows newer than the final
    // watermark, so the last few windows would never emit in a finite run
    val streamed = runToMemory(
      EventsStream.windowedAgg(EventsStream.readStream(spark, streamDir)),
      "win_agg", mode = "complete")
    val batch = EventsStream.windowedAgg(spark.read.parquet(streamDir))
    val s = streamed.select($"window.start", $"event_type", $"n", $"sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1000))).toSet
    val b = batch.select($"window.start", $"event_type", $"n", $"sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1000))).toSet
    assert(s === b)
    assert(s.nonEmpty)
  }

  test("streaming dedup emits each event_id once") {
    // duplicate the source: write the same events twice into the dir shape
    val dir = Files.createTempDirectory("graft-stream-dup").toString
    val raw = spark.read.parquet(streamDir)
    raw.write.mode("overwrite").parquet(dir)
    raw.write.mode("append").parquet(dir)
    val total = spark.read.parquet(dir).count()
    val deduped = runToMemory(
      EventsStream.dedupStream(EventsStream.readStream(spark, dir)), "dedup_stream")
    assert(total === 2 * raw.count())
    assert(deduped.select("event_id").distinct().count() === deduped.count())
    assert(deduped.count() === raw.count())
  }

  test("sessionization groups events by inactivity gap (batch mode)") {
    val events = spark.read.parquet(streamDir)
    val sessions = EventsStream.sessionize(events, gapMs = 60 * 1000L)
    val agg = sessions.groupBy($"user_id")
      .agg(sum($"n_events").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val perUser = events.groupBy($"user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(agg === perUser, "sessions must partition each user's events exactly")
    // sessions respect the gap: start/end within session, ordered
    val s = sessions.collect()
    assert(s.forall(x => !x.end_ts.before(x.start_ts)))
  }

  test("perUserRates sliding window runs on a stream") {
    val out = runToMemory(
      EventsStream.perUserRates(EventsStream.readStream(spark, streamDir)),
      "user_rates")
    assert(out.count() > 0)
  }
}
