package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) columns for training-data pipelines.
 *
 * Media travel as opaque BINARY columns plus typed metadata; decode /
 * feature-extract / resize / frame-sample run as partition-batched
 * transforms over the binary payloads (the Scala analog of
 * `mapInPandas`: one task pulls rows in fixed-size batches, runs the
 * kernel per batch, emits rows — same batch shape, schema discipline,
 * and partitioning story as the Arrow path, without Python).
 *
 * STUB NOTE — this container ships no image/audio codecs, so
 * `decodeBytes` is a clearly-marked deterministic fake (parses our own
 * 12-byte header or derives fake dims/samples from a content hash).
 * The Spark-side plumbing — schemas, batching, partitioning, null
 * handling — is real and tested; swapping in javacv/TwelveMonkeys means
 * replacing ONLY `decodeBytes`.
 */
object Multimodal {

  /** Canonical media-asset schema. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val decodedImageSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  /** Default batch size for partition-batched media kernels (the Arrow
    * `maxRecordsPerBatch` analog — bounds peak memory per task). */
  val DefaultBatchSize = 64

  // ---------------------------------------------------------------
  // STUB decoder — deterministic fake in place of a real codec.
  // Header layout (our synthetic fixtures): magic "GRFT" + int32 width
  // + int32 height; else dims are derived from a content hash.
  // ---------------------------------------------------------------
  private[ops] def decodeBytes(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    // STUB — real image decode (JPEG/PNG) would go here.
    if (bytes.length >= 12 && bytes(0) == 'G' && bytes(1) == 'R' &&
        bytes(2) == 'F' && bytes(3) == 'T') {
      val bb = java.nio.ByteBuffer.wrap(bytes, 4, 8)
      val w = bb.getInt; val h = bb.getInt
      (w, h, 3, bytes.drop(12))
    } else {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 16 + math.abs(h % 16); val ht = 16 + math.abs((h >> 8) % 16)
      (w, ht, 3, bytes)
    }
  }

  /** Encode our synthetic fixture format (test helper / fake data gen). */
  def encodeFake(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
    bb.put("GRFT".getBytes("US-ASCII")).putInt(width).putInt(height).put(payload)
    bb.array()
  }

  /** Partition-batched decode: image assets → decoded pixel rows. */
  def decodeImages(
      assets: DataFrame,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = assets.sparkSession
    val input = assets.filter(col("modality") === "image" && col("bytes").isNotNull)
      .select("asset_id", "bytes")
    val schema = decodedImageSchema
    val rdd = input.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // bounded per-task memory
        batch.iterator.map { row =>
          val (w, h, c, px) = decodeBytes(row.getAs[Array[Byte]]("bytes"))
          Row(row.getString(0), w, h, c, px)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Resize decoded images (STUB kernel: nearest-neighbor index mapping
    * over the fake pixel payload — deterministic, size-correct). */
  def resizeImages(decoded: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = decoded.sparkSession
    val schema = decodedImageSchema
    val rdd = decoded.select("asset_id", "width", "height", "channels", "pixels")
      .rdd.mapPartitions { it =>
        it.map { row =>
          val px = row.getAs[Array[Byte]]("pixels")
          // STUB — real bilinear resample would go here.
          val out = new Array[Byte](math.max(1, newW * newH))
          var i = 0
          while (i < out.length) {
            out(i) = if (px.nonEmpty) px((i.toLong * px.length / out.length).toInt) else 0
            i += 1
          }
          Row(row.getString(0), newW, newH, row.getInt(3), out)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Feature-extract: decoded image → d-dim float embedding, normalized —
    * plugs straight into VectorSearch / Dedup.embeddingNearDupPairs.
    * STUB kernel: histogram-of-bytes features (deterministic). */
  def imageFeatures(decoded: DataFrame, dim: Int = 64): DataFrame = {
    val spark = decoded.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = decoded.select("asset_id", "pixels").rdd.mapPartitions { it =>
      it.map { row =>
        val px = row.getAs[Array[Byte]]("pixels")
        val v = new Array[Float](dim)
        var i = 0
        while (i < px.length) { v(java.lang.Byte.toUnsignedInt(px(i)) % dim) += 1f; i += 1 }
        Row(row.getString(0), graft.functions.VectorFunctions.normalize(v).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-sample videos: every `everyNth` fake frame up to `maxFrames`.
    * STUB kernel: frames are slices of the payload; the exploded
    * one-row-per-frame shape and schema are the real contract. */
  def sampleFrames(
      assets: DataFrame,
      everyNth: Int = 2,
      maxFrames: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val schema = frameSchema
    val rdd = assets.filter(col("modality") === "video" && col("bytes").isNotNull)
      .select("asset_id", "bytes").rdd.mapPartitions { it =>
        it.flatMap { row =>
          val (w, h, _, payload) = decodeBytes(row.getAs[Array[Byte]]("bytes"))
          // STUB — real keyframe extraction would go here.
          val nFrames = math.min(maxFrames, math.max(1, payload.length / math.max(1, w)))
          (0 until nFrames by everyNth).map { f =>
            val start = (f.toLong * payload.length / math.max(1, nFrames)).toInt
            val end = math.min(payload.length, start + math.max(1, w))
            Row(row.getString(0), f, w, h, payload.slice(start, end))
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Audio: STUB pseudo-waveform stats per asset (count/mean/rms over
    * bytes as i8 samples) — the aggregate-over-binary shape. */
  def audioStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("mean_amp", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val rdd = assets.filter(col("modality") === "audio" && col("bytes").isNotNull)
      .select("asset_id", "bytes").rdd.mapPartitions { it =>
        it.map { row =>
          val b = row.getAs[Array[Byte]]("bytes")
          // STUB — real PCM decode would go here; bytes ARE the samples.
          var sum = 0.0; var sq = 0.0
          b.foreach { s => sum += s; sq += s.toDouble * s }
          val n = math.max(1, b.length)
          Row(row.getString(0), b.length.toLong, sum / n, math.sqrt(sq / n))
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
