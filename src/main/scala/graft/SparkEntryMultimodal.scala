package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Filters
import graft.ops.{Dedup, TextAnalysis, VectorSearch}
import graft.GateSupport._

/**
 * Multimodal gates: binary decode -> feature pipelines and the
 * GateStage-staged image/audio/video near-dup pairings.
 *
 * One gate domain of [[SparkEntry]] (assembled there); every entry
 * keeps a matching oracle in this file so a query and its DuckDB
 * replay are reviewed together.
 */
private[graft] object SparkEntryMultimodal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- multimodal: binary decode -> feature-extract pipeline (real
    // grid-moment kernel for rasters, histogram fallback otherwise; the
    // gate pins the pipeline shape — every asset must come out the far
    // end with a d-dim embedding — via the constant-dim SQL oracle) ----
    "multimodal_features" -> ((s, dir) => {
      val assets = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("asset_id"),
        lit("image").as("modality"),
        col("text").cast("binary").as("bytes"),
        map(lit("lang"), col("lang")).as("meta"))
      graft.ops.Multimodal.imageFeatures(
        graft.ops.Multimodal.decodeImages(assets), dim = 16)
        .select(col("asset_id"), size(col("embedding")).cast("long").as("dim"))
    }),

    // ---- multimodal: perceptual-hash near-dup pairs (aHash 8×8
    // luminance bits, pigeonhole-banded bucket join, exact popcount
    // verify). The DECODE half can't be oracled in SQL, so the aHash
    // int64s are STAGED as a parquet intermediate (GateStage) and the
    // PAIRING half — banded-Hamming candidates + popcount verify — runs
    // from the staged frame on the Spark side while DuckDB replays it
    // as a brute-force popcount join over the same bytes (banding has
    // FULL recall at maxDist ≤ 3, so the two are equivalent). The entry
    // PLANTS byte-identical copies of every 20th asset (the
    // dedup_embedding_lsh plant convention) so hamming-0 recall is
    // guaranteed by construction; MultimodalSpec pins real-PNG
    // jitter/invert decode behavior ----
    "multimodal_near_dup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("asset_id"),
        lit("image").as("modality"),
        col("text").cast("binary").as("bytes"),
        map(lit("lang"), col("lang")).as("meta"))
      val planted = base.unionByName(
        base.filter(col("asset_id").cast("long") % 20 === 0)
          .withColumn("asset_id",
            concat(lit("dup_"), col("asset_id"))))
      val fp = graft.ops.Multimodal.imageHashes(
        graft.ops.Multimodal.decodeImages(planted))
      graft.ops.Multimodal.hashNearDupPairs(
        GateStage.stage(s, "multimodal_fp_image", dir, fp),
        "asset_id", "phash", maxDist = 2)
    }),

    // ---- multimodal: audio fingerprint near-dup (64 RMS-window bits,
    // gain-invariant; same staged-fingerprint + banded-Hamming
    // machinery as multimodal_near_dup; planted copies guarantee
    // recall; DuckDB replays the pairing from the staged int64s) ----
    "multimodal_audio_dup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("asset_id"),
        lit("audio").as("modality"),
        col("text").cast("binary").as("bytes"),
        map(lit("lang"), col("lang")).as("meta"))
      val planted = base.unionByName(
        base.filter(col("asset_id").cast("long") % 20 === 0)
          .withColumn("asset_id", concat(lit("dup_"), col("asset_id"))))
      val fp = graft.ops.Multimodal.audioFingerprints(planted)
      graft.ops.Multimodal.hashNearDupPairs(
        GateStage.stage(s, "multimodal_fp_audio", dir, fp),
        "asset_id", "afp", maxDist = 2)
    }),

    // ---- multimodal: video near-dup by shared keyframe hashes
    // (sampleFrames → per-frame aHash → staged (asset_id, phash) →
    // 8-byte-hash equi-join; planted copies guarantee recall; DuckDB
    // replays the shared-hash join from the staged frame) ----
    "multimodal_video_dup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("asset_id"),
        lit("video").as("modality"),
        col("text").cast("binary").as("bytes"),
        map(lit("lang"), col("lang")).as("meta"))
      val planted = base.unionByName(
        base.filter(col("asset_id").cast("long") % 20 === 0)
          .withColumn("asset_id", concat(lit("dup_"), col("asset_id"))))
      val fh = graft.ops.Multimodal.frameHashes(planted)
        .select(col("asset_id"), col("phash"))
      graft.ops.Multimodal.sharedHashPairs(
        GateStage.stage(s, "multimodal_fp_video", dir, fh),
        "asset_id", "phash", minShared = 1)
    })

  )

  /** Oracle SQL with GateStage globs resolved for `scope` (the sf dir
    * of the Verify run) when known — one JVM may stage a name under
    * several scopes, which the scope-less resolution reports as a loud
    * `__AMBIGUOUS_STAGE__` sentinel rather than guessing. */
  def oracleSql(scope: Option[String]): Map[String, String] = {
    def glob(name: String): String =
      scope.map(GateStage.oracleGlob(name, _)).getOrElse(GateStage.oracleGlob(name))
    Map(
    // Every image asset must survive decode → feature-extract with a
    // dim-16 embedding: asset ids and the size of each output vector are
    // deterministic even though the kernel itself has no SQL analog.
    "multimodal_features" ->
      "SELECT doc_id::VARCHAR AS asset_id, 16::BIGINT AS dim FROM documents",

    // Near-dup pairing replayed from the GateStage fingerprint parquet
    // (the decode half is spec-tested; the staged int64s make the
    // banded-Hamming + popcount pairing SQL-checkable). DuckDB's
    // bit_count(xor(BIGINT)) matches java.lang.Long.bitCount(a ^ b);
    // the brute-force popcount join equals the Spark side's banded join
    // because 4×16-bit pigeonhole banding has full recall at dist ≤ 3.
    // DISTINCT mirrors the Spark side's (id, hash) dedup in
    // hashNearDupPairs — a repeated staged asset_id must not duplicate
    // oracle pairs (the video oracle below does the same).
    "multimodal_near_dup" ->
      s"""WITH fp AS (SELECT DISTINCT asset_id, phash
         |            FROM '${glob("multimodal_fp_image")}')
         |SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         |       bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
         |FROM fp a JOIN fp b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 2""".stripMargin,

    "multimodal_audio_dup" ->
      s"""WITH fp AS (SELECT DISTINCT asset_id, afp
         |            FROM '${glob("multimodal_fp_audio")}')
         |SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         |       bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
         |FROM fp a JOIN fp b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.afp, b.afp)) <= 2""".stripMargin,

    "multimodal_video_dup" ->
      s"""WITH fh AS (SELECT DISTINCT asset_id, phash
         |            FROM '${glob("multimodal_fp_video")}')
         |SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         |       count(*)::BIGINT AS n_shared
         |FROM fh a JOIN fh b ON a.phash = b.phash AND a.asset_id < b.asset_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 1""".stripMargin

    )
  }
}
