package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStream

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  /** events at sf0.001, ts as proper timestamps, written to a stream dir. */
  private lazy val streamDir: String = withLogLevel {
    val read = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // the driver has shipped events.ts as TIMESTAMP(NANOS) (surfacing as
    // long nanos under nanosAsLong), as TIMESTAMP_NTZ micros, and as
    // TIMESTAMP — normalize whichever this dataset carries
    val raw = read.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        read.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        read.withColumn("ts", col("ts").cast("timestamp"))
      case _ => read
    }
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

  test("streaming ingestion upserts micro-batches into a collection") {
    import graft.core.{DB, Document}
    import graft.embed.HashingEmbeddingFunc
    val srcDir = Files.createTempDirectory("graft-coll-stream").toString
    val ckpt = Files.createTempDirectory("graft-coll-ckpt").toString
    // land two files, the second overwriting an id from the first
    val batch1 = Seq(
      ("a", Map("v" -> "1"), "first doc"),
      ("b", Map("v" -> "1"), "second doc"))
    val batch2 = Seq(("a", Map("v" -> "2"), "first doc UPDATED"))
    def land(rows: Seq[(String, Map[String, String], String)]): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(r =>
            org.apache.spark.sql.Row(r._1, r._2, null, r._3))), Document.schema)
        .write.mode("append").parquet(srcDir)
    land(batch1); land(batch2)
    val db = DB.inMemory(spark, new HashingEmbeddingFunc(16))
    val c = db.createCollection("streamed")
    val q = c.addStream(
      spark.readStream.schema(Document.schema).parquet(srcDir), ckpt)
    q.awaitTermination(120000)
    assert(c.count() === 2)
    // both files may land in one micro-batch (order undefined within it),
    // but doc "b" is stable and embeddings were auto-filled
    assert(c.getByID("b").metadata("v") === "1")
    assert(c.getByID("a").embedding != null && c.getByID("a").embedding.nonEmpty)
  }

  test("streaming simhash dedup drops permutation/case variants") {
    val dir = Files.createTempDirectory("graft-simdedup").toString
    val docs = Seq(
      ("d1", "the quick brown fox", "2024-01-01 10:00:00"),
      ("d2", "The Quick BROWN Fox", "2024-01-01 10:00:10"),   // case variant
      ("d3", "fox brown quick the", "2024-01-01 10:00:20"),   // permutation
      ("d4", "completely different words entirely", "2024-01-01 10:00:30"))
    spark.createDataFrame(docs).toDF("doc_id", "text", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val out = runToMemory(
      graft.streaming.EventsStream.dedupBySimhash(
        spark.readStream.schema(schema).parquet(dir), "text", "ts"),
      "sim_dedup")
    val kept = out.select("doc_id").collect().map(_.getString(0)).toSet
    assert(kept.size === 2, s"kept $kept")
    assert(kept.contains("d4"))
    assert(kept.intersect(Set("d1", "d2", "d3")).size === 1)
  }

  test("native session_window agrees with the flatMapGroupsWithState sessionizer") {
    val ev = spark.read.parquet(streamDir)
    val gap = "6 hours"
    val native = ev.groupBy($"user_id",
        session_window($"ts", gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"w.start".as("s"), $"n")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val custom = EventsStream.sessionize(ev, gapMs = 6 * 3600 * 1000L)
      .toDF().select($"user_id", $"start_ts", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(native === custom,
      "two independent sessionizers must produce identical islands")
    assert(native.nonEmpty)
  }

  test("stream-stream interval join matches the batch join") {
    val ev = spark.read.parquet(streamDir)
    def side(t: String, prefix: String) = ev.filter($"event_type" === t)
      .select($"user_id", $"event_id".as(s"${prefix}_id"), $"ts".as(s"${prefix}_ts"))
    val purchases = side("purchase", "p")
    val clicks = side("click", "c")
    // batch reference: plain inequality join with the same bounds
    val expected = purchases.join(clicks,
        purchases("user_id") === clicks("user_id") &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 minutes") && $"c_ts" <= $"p_ts")
      .select($"p_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce at least one pair")
    // streaming run over the same data
    val pDir = Files.createTempDirectory("graft-ij-p").toString
    val cDir = Files.createTempDirectory("graft-ij-c").toString
    purchases.write.mode("overwrite").parquet(pDir)
    clicks.write.mode("overwrite").parquet(cDir)
    def rs(dir: String) = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val streamed = runToMemory(
      EventsStream.intervalJoin(rs(pDir), rs(cDir), "user_id",
        "p_ts", "c_ts", "30 minutes").select($"p_id", $"c_id"),
      "interval_join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === expected)
    // colliding non-key columns are rejected up front
    intercept[IllegalArgumentException] {
      EventsStream.intervalJoin(purchases, purchases, "user_id", "p_ts", "p_ts")
    }
  }

  test("stream-static broadcast enrich matches the batch join") {
    val ev = spark.read.parquet(streamDir)
    val dim = ev.select($"user_id").distinct()
      .withColumn("tier", when($"user_id" % 2 === 0, "even").otherwise("odd"))
    val expected = ev.join(dim, Seq("user_id"))
      .select($"event_id", $"tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = runToMemory(
      EventsStream.enrich(EventsStream.readStream(spark, streamDir), dim, "user_id")
        .select($"event_id", $"tier"),
      "enrich")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === expected)
  }

  test("perUserRates sliding window runs on a stream") {
    val out = runToMemory(
      EventsStream.perUserRates(EventsStream.readStream(spark, streamDir)),
      "user_rates")
    assert(out.count() > 0)
  }

  test("ingest replay guard: NULL text is not conflated with empty text, and null <=> null suppresses replays") {
    // the guard's dedup keys hash null DISTINCT from '' (xxhash64 skips
    // null args) and confirm equality null-safely: a genuinely new
    // null-text doc must be ADMITTED past an ''-text corpus doc, an
    // ''-text re-crawl must drop against it, and a second null-text
    // crawl must drop against the committed null-text doc (r12 fix —
    // coalesce-to-'' conflated all three cases)
    import graft.streaming.CorpusIngest
    import graft.persist.SnapshotStore
    val srcDir = Files.createTempDirectory("graft-nulltext-src").toString
    val ckpt = Files.createTempDirectory("graft-nulltext-ckpt").toString
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-nulltext-store").toString)
    def docsDF(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    store.commit(docsDF(Seq(
      (1L, ""), (2L, "some real corpus document text here"))))
    docsDF(Seq(
      (10L, null),  // new: NULL text ≠ the corpus's '' text
      (11L, "")     // dup: exact '' match against corpus doc 1
    )).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runIngest(): Unit = {
      val q = CorpusIngest.dedupedIngest(
        spark.readStream.schema(schema).parquet(srcDir),
        store, "text", "doc_id", threshold = 0.8, checkpointDir = ckpt)
      q.awaitTermination(120000)
    }
    def ids() = store.readLatest(spark)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    withLogLevel { runIngest() }
    val after1 = ids()
    assert(after1.contains(10L), "null-text doc must not drop as a dup of ''")
    assert(!after1.contains(11L), "''-text re-crawl must drop against the '' corpus doc")
    // second crawl: an exact NULL-text replay must now drop (null <=> null)
    docsDF(Seq((20L, null))).coalesce(1).write.mode("append").parquet(srcDir)
    withLogLevel { runIngest() }
    assert(ids() === after1, "a second null-text doc must drop against the committed one")
  }

  test("streaming deduped ingest: stream ≡ batch, cross-batch suppression") {
    import graft.ops.Dedup
    import graft.persist.SnapshotStore
    import graft.streaming.CorpusIngest
    val srcDir = Files.createTempDirectory("graft-ingest-src").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-ingest-store").toString)

    def docsDF(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
    // seed corpus: the nightly loop's current snapshot
    val corpus0 = docsDF(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "colorless green ideas sleep furiously tonight again")))
    store.commit(corpus0)

    // batch 1: one exact re-crawl of corpus doc 1 (must drop), one exact
    // self-dup inside the batch (one survivor), one genuinely new doc
    val batch1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),  // corpus dup
      (11L, "entirely novel words describing unrelated things here"),
      (12L, "entirely novel words describing unrelated things here"), // self-dup
      (13L, "a second fresh document with its own distinct content"))
    docsDF(batch1).coalesce(1).write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def runIngest(): Unit = {
      val q = CorpusIngest.dedupedIngest(
        spark.readStream.schema(schema).parquet(srcDir),
        store, "text", "doc_id", threshold = 0.8, checkpointDir = ckpt)
      q.awaitTermination(120000)
    }
    withLogLevel { runIngest() }

    // stream ≡ batch: one micro-batch, so the committed corpus must be
    // bit-equal in ids to the batch pipeline on the same input
    val expect1 = {
      val selfClean = Dedup.exactSurvivors(docsDF(batch1), "text", "doc_id")
      val fresh = Dedup.newAgainstCorpus(
        selfClean, corpus0, "text", "doc_id", 0.8)
      corpus0.unionByName(fresh)
    }
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val after1 = ids(store.readLatest(spark))
    assert(after1 === ids(expect1))
    assert(after1.contains(13L) && !after1.contains(10L))
    assert(after1.intersect(Set(11L, 12L)).size === 1) // one self-dup survivor

    // batch 2: re-crawls a doc ADMITTED by batch 1 (cross-batch
    // suppression: the corpus side is re-read from the store each batch)
    // plus one new doc
    docsDF(Seq(
      (20L, "a second fresh document with its own distinct content"), // batch-1 dup
      (21L, "yet another completely independent piece of writing")))
      .coalesce(1).write.mode("append").parquet(srcDir)
    withLogLevel { runIngest() } // same checkpoint → only the new file

    val after2 = ids(store.readLatest(spark))
    assert(after2 === after1 + 21L, s"got $after2")
    // prior versions stay readable (time travel over ingest history)
    assert(ids(store.read(spark, 1L)) === Set(1L, 2L))
  }

  test("deduped ingest applies the quality gate before dedup (junk never committed)") {
    import graft.persist.SnapshotStore
    import graft.streaming.CorpusIngest
    import graft.ops.TextAnalysis
    val srcDir = Files.createTempDirectory("graft-ingest3-src").toString
    val ckpt = Files.createTempDirectory("graft-ingest3-ckpt").toString
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-ingest3-store").toString)
    Seq(
      (1L, "the data and model that have with broad coverage here"),
      (2L, "junk junk junk junk junk junk junk junk junk junk"), // no stopwords
      (3L, "too short"))                                         // < 5 words
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    // oracle-gated batch filter composed directly into the stream
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      b => TextAnalysis.gopherRules(b, "text", minWords = 5)
        .filter(col("pass_word_count") && col("pass_stopwords"))
        .select("doc_id", "text")
    withLogLevel {
      val q = CorpusIngest.dedupedIngest(
        spark.readStream.schema(schema).parquet(srcDir),
        store, "text", "doc_id", threshold = 0.8, checkpointDir = ckpt,
        qualityGate = gate)
      q.awaitTermination(120000)
    }
    val ids = store.readLatest(spark)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L), s"quality gate must reject 2 and 3, got $ids")
  }

  test("deduped ingest suppresses re-crawled zero-shingle docs (exact-text guard)") {
    import graft.persist.SnapshotStore
    import graft.streaming.CorpusIngest
    val srcDir = Files.createTempDirectory("graft-ingest2-src").toString
    val ckpt = Files.createTempDirectory("graft-ingest2-ckpt").toString
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-ingest2-store").toString)
    // seed with one normal doc so the non-seed (guarded) batch path runs
    store.commit(Seq((1L, "a perfectly ordinary seed document with words"))
      .toDF("doc_id", "text"))

    // "hi there" is shorter than the 3-word shingle window: it produces
    // NO MinHash signature, so ONLY the exact-text anti-join can stop a
    // re-crawl of it — this is the at-least-once replay window
    Seq((10L, "hi there")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runIngest(): Unit = {
      val q = CorpusIngest.dedupedIngest(
        spark.readStream.schema(schema).parquet(srcDir),
        store, "text", "doc_id", threshold = 0.8, checkpointDir = ckpt)
      q.awaitTermination(120000)
    }
    withLogLevel { runIngest() }
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(store.readLatest(spark)) === Set(1L, 10L))

    // re-crawl of the same zero-shingle text under a new id — the
    // MinHash filter is blind to it; the exact-text guard must drop it
    Seq((20L, "hi there")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    withLogLevel { runIngest() }
    assert(ids(store.readLatest(spark)) === Set(1L, 10L))
  }

  test("streaming heavy hitters match the batch sketch per window (exact regime)") {
    val streamed = runToMemory(
      EventsStream.heavyHittersStream(
        EventsStream.readStream(spark, streamDir), "user_id",
        capacity = 4096, topN = 5),
      "hh_stream", mode = "complete")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val batch = EventsStream.heavyHittersStream(
        spark.read.parquet(streamDir), "user_id", capacity = 4096, topN = 5)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming windowed distinct matches the batch computation") {
    // two stacked stateful aggs (dedup level + count level) — same
    // complete-mode escape as trending (no eviction ⇒ no late-discard)
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(key, "false")
    val streamed = try runToMemory(
      graft.ops.TimeSeries.windowDistinct(
        EventsStream.readStream(spark, streamDir), "ts", "user_id"),
      "win_distinct", mode = "complete")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    finally spark.conf.set(key, "true")
    val batch = graft.ops.TimeSeries.windowDistinct(
        spark.read.parquet(streamDir), "ts", "user_id")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming windowed distinct KMV sketch matches the batch computation") {
    // the bounded-state twin: ONE stateful aggregate whose KMV partial
    // is mergeable, so micro-batch partials combine exactly like
    // map-side partials and stream ≡ batch bit-for-bit. k=64 keeps the
    // estimate arm reachable (windows with >64 distinct users estimate;
    // smaller windows are exact) — both arms must agree across modes.
    val streamed = runToMemory(
      graft.ops.TimeSeries.windowDistinctApprox(
        EventsStream.readStream(spark, streamDir), "ts", "user_id",
        sketchK = 64),
      "win_distinct_kmv", mode = "complete")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.ops.TimeSeries.windowDistinctApprox(
        spark.read.parquet(streamDir), "ts", "user_id", sketchK = 64)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming trending top-k matches the batch computation") {
    // Two stacked stateful aggregates. Spark's global-watermark checker
    // flags ANY chained stateful pair conservatively; in COMPLETE mode no
    // state is ever evicted by the watermark, so late-row discard — the
    // risk the check guards — cannot occur. Disable it for this query
    // only (the escape hatch Spark's own error message prescribes).
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(key, "false")
    val streamed = try runToMemory(
      EventsStream.trendingTypes(EventsStream.readStream(spark, streamDir), 3),
      "trending", mode = "complete")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    finally spark.conf.set(key, "true")
    val batch = EventsStream
      .trendingTypes(spark.read.parquet(streamDir), 3)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
