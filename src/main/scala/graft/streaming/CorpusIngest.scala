package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup
import graft.persist.SnapshotStore

/**
 * Streaming tier of the incremental-ingest loop
 * (`graft.examples.IncrementalIngest`, batch form): a document stream is
 * exact-self-deduped, near-dedup-filtered against the CURRENT corpus
 * snapshot, and the survivors committed as the next snapshot version —
 * continuously, one micro-batch at a time.
 *
 * Why foreachBatch: `Dedup.newAgainstCorpus` is a banded MinHash
 * batch×corpus join (groupBy + distinct + anti-join) — relational shapes
 * Structured Streaming cannot run incrementally in append mode. Inside
 * foreachBatch each micro-batch is an ordinary batch frame, so the
 * EXACT batch operator runs unchanged (stream ≡ batch by construction,
 * pinned in StreamingSpec), and the corpus side re-reads the snapshot
 * store's latest version each batch — so batch N+1 dedups against
 * everything batch N admitted, with no unbounded in-memory state and no
 * growing plan lineage (every version is plain parquet).
 *
 * Scale shape: per micro-batch the DEDUP cost is one corpus-side
 * signature pass + the banded join — the same envelope as the nightly
 * batch job. The COMMIT, however, rewrites the full corpus∪fresh into
 * the next snapshot version (immutable whole-corpus versions are what
 * make time-travel diffing trivial), so per-batch write cost is
 * O(corpus): right for the bounded ingest runs this targets
 * (AvailableNow over a landing zone, nightly tails), wrong for a
 * high-frequency trigger over a huge corpus — there, commit only
 * `fresh` per batch into an append-log layout and compact on a cadence;
 * the dedup side of this operator is unchanged by that choice.
 *
 * Delivery contract: foreachBatch is AT-LEAST-once (a crash between
 * `store.commit` and the checkpoint advancing replays the batch), so
 * commits are EFFECTIVELY-once via re-dedup, not exactly-once: a
 * replayed doc re-arrives, near-dedups against the corpus copy of
 * itself at similarity 1.0, and is dropped. Docs that produce no
 * shingles (text shorter than `shingleSize`) would bypass the MinHash
 * filter, so the batch path closes that window with an exact-text
 * anti-join against the corpus before committing.
 */
object CorpusIngest {

  /**
   * Start the deduped-ingest stream. `docs` is a STREAMING frame
   * carrying `idCol` + `textCol` (extra columns pass through to the
   * committed corpus). An empty store seeds itself with the first
   * batch's exact-survivors.
   *
   * `qualityGate` runs FIRST on every micro-batch (before any dedup
   * work — rejected docs never pay signature or join cost). It is an
   * ordinary batch-frame transform, so the oracle-gated batch filters
   * compose directly, e.g.
   * `b => TextAnalysis.gopherRules(b, "text").filter(col("pass_gopher"))
   *       .drop(gopherAuditCols: _*)`
   * — the stream admits exactly what the batch pipeline would admit
   * (stream ≡ batch, pinned in StreamingSpec). The gate must preserve
   * the batch's schema for the committed corpus to stay unioned-able.
   */
  def dedupedIngest(
      docs: DataFrame,
      store: SnapshotStore,
      textCol: String,
      idCol: String,
      threshold: Double,
      checkpointDir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      qualityGate: DataFrame => DataFrame = identity): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val selfClean = Dedup.exactSurvivors(qualityGate(batch), textCol, idCol)
        // seed/read decided by the latest POINTER, not the version
        // directory listing: a crash inside commit's rename→pointer
        // window leaves a renamed version dir with no pointer, and the
        // pointer is the read source of truth (SnapshotStore contract) —
        // checking `versions` there would send every replay into
        // readLatest's 'no committed snapshot' failure loop, while the
        // pointer check correctly re-seeds over the orphaned dir's slot
        if (store.latestVersion.isEmpty) {
          // persist: the emptiness probe and the commit would otherwise
          // each recompute the full quality gate + exact self-dedup
          // chain — doubled on exactly the largest batch (a bulk
          // AvailableNow initial load lands in ONE micro-batch)
          val seeded = selfClean.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try { if (!seeded.isEmpty) { store.commit(seeded); () } }
          finally { seeded.unpersist(); () }
        } else {
          val corpus = store.readLatest(spark)
          val nearNew = Dedup.newAgainstCorpus(
            selfClean, corpus, textCol, idCol, threshold,
            numHashes, bands, shingleSize)
          // replay guard (see delivery contract above): identical text
          // already in the corpus near-dedups at similarity 1.0 ONLY
          // when it shingles; zero-shingle docs (shorter than
          // shingleSize) would re-commit on an at-least-once replay, so
          // suppress exact-text matches explicitly.
          // NULL-vs-'' discipline: a null text must equal ITSELF across
          // replays but must NOT conflate with the empty string (a
          // genuinely new null-text doc would silently drop as a
          // "duplicate" of an ''-text corpus doc, and vice versa). The
          // hash keeps them distinct — xxhash64 SKIPS null arguments,
          // so xxhash64(0L, null) = seed-only hash ≠ xxhash64(0L, '')
          // — and the text-equality confirm is NULL-SAFE (<=>):
          // null <=> null is true (replay-safe), null <=> '' is false.
          // Shape: the batch side is small, so its hashes broadcast
          // DOWN into the corpus scan as a semi-join filter, and the
          // HASH-MATCHED corpus rows (≈ batch-sized) broadcast back
          // carrying their text — the anti-join confirms FULL text
          // equality, so a 64-bit xxhash64 collision with a different
          // corpus text cannot silently drop a genuinely new doc
          // (birthday-regime risk at multi-billion-row corpora). The
          // corpus is scanned but never shuffled/distinct-ed per
          // micro-batch, and corpus text travels only for hash matches.
          import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, expr, lit, sum, xxhash64}
          val batchHashed = nearNew
            .withColumn("__text_c", col(textCol))
            .withColumn("__text_h", xxhash64(lit(0L), col(textCol)))
            // persist: the hash semi-join probe below and the anti-join
            // left side are different subtrees of the same plan — without
            // this the banded batch×corpus join runs twice PER ACTION,
            // on top of once per action (emptiness probe, commit)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          var corpusHits: org.apache.spark.sql.DataFrame = null
          var fresh: org.apache.spark.sql.DataFrame = null
          // the try starts HERE — before the first ACTION on any
          // persisted frame — so a failed guard job (executor loss,
          // corrupt corpus file) cannot leak this batch's blocks into
          // the restarted query's session
          try {
            // the batch key set is a FORCED broadcast too, so bound it
            // like every forced broadcast in this repo: a bulk
            // AvailableNow first read (file source, no maxFilesPerTrigger)
            // lands the whole landing zone in ONE micro-batch, and
            // "batch-sized" stops being small. The bound is ROWS in the
            // built hash relation, not raw key bytes: a broadcast
            // LongToUnsafeRowMap costs ~50-100 bytes/row of driver +
            // per-executor heap (UnsafeRow + map slots), so 1M rows
            // ≈ 100 MB resident — the same band as corpusHits' row
            // bound. Over it, drop the hint and let the planner shuffle
            // the semi-join loudly.
            val batchKeys = batchHashed.select(col("__text_h")).distinct()
            val keyRows = batchKeys.count()
            val keysSide =
              if (keyRows <= 1000000L) broadcast(batchKeys)
              else {
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"corpus ingest: $keyRows distinct batch text hashes " +
                    "exceed the broadcast bound; using a shuffled " +
                    "semi-join for this micro-batch")
                batchKeys
              }
            corpusHits = corpus
              .select(xxhash64(lit(0L), col(textCol)).as("__text_h"),
                col(textCol).as("__corpus_text"))
              .join(keysSide, Seq("__text_h"), "left_semi")
              // distinct: hash-MATCH count is bounded by the batch, but
              // the corpus may hold arbitrarily many COPIES of a matched
              // text — collapse them so the shipped pairs are ≤ the
              // batch's distinct hashes (+ vanishingly rare 64-bit
              // collisions), one row per distinct matched text
              .distinct()
              // persist (NOT localCheckpoint — those blocks have no
              // release API and would accumulate across micro-batches):
              // the guard aggregate below materializes it once, the
              // anti-join reads the same blocks, and the finally releases
              // them with the batch's other persists
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // forced-broadcast guard (the TextAnalysis.boundedBroadcast
            // rule): very LARGE matched documents can still blow the
            // driver even at batch-bounded row counts — over either
            // bound, fall back to a shuffled anti-join loudly
            val Array(hitRows, hitBytes) = {
              // octet_length = real UTF-8 bytes, not length()'s char
              // count; the deserialized driver-heap copy is UTF-16, at
              // most 2× the octets (ASCII worst case), so a 128 MiB
              // octet bound keeps the materialized broadcast ≤~256 MiB
              // of heap chars
              val r = corpusHits.agg(count(lit(1)),
                coalesce(sum(expr("octet_length(__corpus_text)")), lit(0L))).head()
              Array(r.getLong(0), r.getLong(1))
            }
            val hitsSide =
              if (hitRows <= 1000000L && hitBytes <= 128L * 1024 * 1024)
                broadcast(corpusHits)
              else {
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"corpus ingest: $hitRows matched corpus texts / " +
                    s"$hitBytes utf8 bytes exceed the broadcast bound; using a " +
                    "shuffled anti-join for this micro-batch")
                corpusHits
              }
            fresh = batchHashed
              .join(hitsSide,
                batchHashed("__text_h") === hitsSide("__text_h") &&
                  (batchHashed("__text_c") <=> hitsSide("__corpus_text")),
                "left_anti")
              .drop("__text_h", "__text_c")
              // persist: the emptiness probe and the commit otherwise
              // each re-run the corpus-side hash pass
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            if (!fresh.isEmpty) { store.commit(corpus.unionByName(fresh)); () }
          } finally {
            if (fresh != null) fresh.unpersist()
            if (corpusHits != null) corpusHits.unpersist()
            batchHashed.unpersist()
            ()
          }
        }
      }
      .start()
}
