package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, VectorSearch}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def assets = withLogLevel {
    val rnd = new scala.util.Random(42)
    val rows = Seq(
      Row("img1", "image", Multimodal.encodeFake(32, 24,
        Array.fill(32 * 24)(rnd.nextInt(256).toByte)), Map("src" -> "cam")),
      Row("img2", "image", Multimodal.encodeFake(8, 8,
        Array.fill(64)(rnd.nextInt(256).toByte)), Map.empty[String, String]),
      Row("imgdup", "image", null, Map.empty[String, String]), // null payload skipped
      Row("aud1", "audio", Array.fill(1000)(rnd.nextInt(256).toByte), Map("sr" -> "16000")),
      Row("vid1", "video", Multimodal.encodeFake(16, 16,
        Array.fill(256)(rnd.nextInt(256).toByte)), Map.empty[String, String]))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
  }

  test("decodeImages honors header dims, skips nulls and non-images") {
    val d = Multimodal.decodeImages(assets, batchSize = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(d.map(_._1).toSeq === Seq("img1", "img2"))
    assert(d(0) === (("img1", 32, 24, 3)))
    assert(d(1) === (("img2", 8, 8, 3)))
  }

  test("resize produces exactly the requested payload size, deterministic") {
    val decoded = Multimodal.decodeImages(assets)
    val r1 = Multimodal.resizeImages(decoded, 16, 16).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]]("pixels").length)).sortBy(_._1)
    assert(r1.forall { case (_, w, h, len) => w == 16 && h == 16 && len == 256 })
    val again = Multimodal.resizeImages(decoded, 16, 16).collect()
      .map(r => r.getAs[Array[Byte]]("pixels").toSeq).toSet
    assert(again === r1.indices.map(i =>
      Multimodal.resizeImages(decoded, 16, 16).collect()(i)
        .getAs[Array[Byte]]("pixels").toSeq).toSet)
  }

  test("imageFeatures yields normalized embeddings usable by VectorSearch") {
    val feats = Multimodal.imageFeatures(Multimodal.decodeImages(assets), dim = 32)
    val rows = feats.collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      assert(v.length === 32)
      assert(math.abs(graft.functions.VectorFunctions.norm(v) - 1.0) < 1e-6)
    }
    val q = rows.head.getSeq[Float](1).toArray
    val top = VectorSearch.topK(feats, "embedding", q, 1, "asset_id").collect()
    assert(top.head.getString(0) === rows.head.getString(0))
  }

  test("imageFeatures on a real raster are spatial grid means, not a histogram") {
    // 4×2 PNG, left half red / right half blue: with dim=4 the 2×2 grid
    // cells are (left, right) × (top, bottom); Rec.601 luminance of pure
    // red = 0.299·255, pure blue = 0.114·255.
    val rows = Seq(Row("png1", "image", realPng(), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val v = Multimodal.imageFeatures(Multimodal.decodeImages(df), dim = 4)
      .collect().head.getSeq[Float](1).toArray
    val raw = graft.ops.Multimodal.gridColorMoments(
      Multimodal.decodeImages(df).collect().head.getAs[Array[Byte]]("pixels"),
      4, 2, 3, 4)
    assert(math.abs(raw(0) - 0.299f) < 1e-3 && math.abs(raw(2) - 0.299f) < 1e-3,
      s"left cells must be red luminance: ${raw.toSeq}")
    assert(math.abs(raw(1) - 0.114f) < 1e-3 && math.abs(raw(3) - 0.114f) < 1e-3,
      s"right cells must be blue luminance: ${raw.toSeq}")
    assert(math.abs(graft.functions.VectorFunctions.norm(v) - 1.0) < 1e-6)
  }

  test("sampleFrames explodes one row per sampled frame with frame indices") {
    val frames = Multimodal.sampleFrames(assets, everyNth = 2, maxFrames = 8).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getString(0) === "vid1"))
    val idxs = frames.map(_.getInt(1)).sorted
    assert(idxs.forall(_ % 2 === 0))
  }

  test("audioStats aggregates over binary samples") {
    val s = Multimodal.audioStats(assets).collect()
    assert(s.length === 1)
    assert(s.head.getString(0) === "aud1")
    assert(s.head.getLong(1) === 1000L)
    assert(s.head.getDouble(3) > 0) // rms
  }

  // ---- real-codec cases (JDK javax.imageio / javax.sound) ----

  /** A real PNG: 4×2, left half red (255,0,0), right half blue (0,0,255). */
  private def realPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages decodes a real PNG byte array with correct dims and pixels") {
    val rows = Seq(Row("png1", "image", realPng(), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val d = Multimodal.decodeImages(df).collect()
    assert(d.length === 1)
    assert((d(0).getInt(1), d(0).getInt(2), d(0).getInt(3)) === ((4, 2, 3)))
    val px = d(0).getAs[Array[Byte]]("pixels")
    assert(px.length === 4 * 2 * 3)
    // pixel (0,0) red, pixel (3,0) blue — interleaved RGB
    assert((px(0) & 0xFF, px(1) & 0xFF, px(2) & 0xFF) === ((255, 0, 0)))
    val o = 3 * 3
    assert((px(o) & 0xFF, px(o + 1) & 0xFF, px(o + 2) & 0xFF) === ((0, 0, 255)))
  }

  test("real raster resize is a true bilinear resample") {
    // 2×1 single-channel: [0, 100] → 3×1 should interpolate the middle
    val out = Multimodal.bilinearResize(Array[Byte](0, 100), 2, 1, 1, 3, 1)
    assert(out.map(_ & 0xFF).toSeq === Seq(0, 50, 100))
    // end-to-end: real PNG through decode→resize keeps channel count
    val rows = Seq(Row("png1", "image", realPng(), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val r = Multimodal.resizeImages(Multimodal.decodeImages(df), 8, 4).collect()
    assert(r.head.getAs[Array[Byte]]("pixels").length === 8 * 4 * 3)
    // left edge stays red, right edge stays blue after upsample
    val px = r.head.getAs[Array[Byte]]("pixels")
    assert((px(0) & 0xFF) === 255 && (px(2) & 0xFF) === 0)
    assert((px(7 * 3) & 0xFF) === 0 && (px(7 * 3 + 2) & 0xFF) === 255)
  }

  /** A real MJPEG-in-AVI: RIFF('AVI ', LIST('movi', 00dc JPEG chunks)),
    * each frame a solid-color 6×4 JPEG written by ImageIO. */
  private def mjpegAvi(colors: Seq[Int]): Array[Byte] =
    mjpegAviFrom(colors.map { rgb =>
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, rgb)
      img
    })

  private def mjpegAviFrom(imgs: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    imgs.map(jpeg).foreach { f =>
      movi.write("00dc".getBytes("US-ASCII")); movi.write(le32(f.length))
      movi.write(f)
      if (f.length % 2 == 1) movi.write(0) // RIFF word alignment
    }
    val riff = new java.io.ByteArrayOutputStream()
    riff.write("AVI ".getBytes("US-ASCII"))
    riff.write("LIST".getBytes("US-ASCII")); riff.write(le32(movi.size()))
    riff.write(movi.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(riff.size()))
    out.write(riff.toByteArray)
    out.toByteArray
  }

  test("sampleFrames REALLY decodes MJPEG/AVI keyframes (RIFF + ImageIO)") {
    // 5 solid frames: red, green, blue, white, black; sample every 2nd
    val avi = mjpegAvi(Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF, 0x000000))
    val rows = Seq(Row("avi1", "video", avi, Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val frames = Multimodal.sampleFrames(df, everyNth = 2, maxFrames = 8)
      .collect().sortBy(_.getInt(1))
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2, 4), "frames 0,2,4 sampled")
    assert(frames.forall(f => f.getInt(2) === 6 && f.getInt(3) === 4),
      "true JPEG dims, not container guesses")
    // JPEG is lossy but a solid frame decodes within a few counts
    def ch(r: Row, c: Int): Int = r.getAs[Array[Byte]]("pixels")(c) & 0xFF
    assert(ch(frames(0), 0) > 220 && ch(frames(0), 1) < 90, "frame 0 is red")
    assert(ch(frames(1), 2) > 220 && ch(frames(1), 0) < 90, "frame 2 is blue")
    assert(frames(2).getAs[Array[Byte]]("pixels").forall(b => (b & 0xFF) < 50),
      "frame 4 is black")
  }

  /** A real 16-bit mono WAV of a constant full-scale-half square wave. */
  private def realWav(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(samples)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioStats decodes real WAV PCM (16-bit normalized samples)") {
    val half = (16384, -16384) // ±0.5 full scale
    val samples = Array.fill(400)(half._1.toShort) ++ Array.fill(400)(half._2.toShort)
    val rows = Seq(Row("wav1", "audio", realWav(samples), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val s = Multimodal.audioStats(df).collect()
    assert(s.length === 1)
    assert(s.head.getLong(1) === 800L)
    assert(math.abs(s.head.getDouble(2)) < 1e-9) // symmetric wave ⇒ mean 0
    assert(math.abs(s.head.getDouble(3) - 0.5) < 1e-3) // rms = 0.5 full scale
  }

  /** A real 16×16 PNG: horizontal luminance gradient + seeded jitter. */
  private def gradientPng(jitter: Int, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until 16; x <- 0 until 16) {
      val base = if (invert) 255 - x * 16 else x * 16
      val v = (base + (rnd.nextInt(2 * jitter + 1) - jitter)).max(0).min(255)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageNearDupPairs: jittered re-render pairs up, inverted image does not") {
    val rows = Seq(
      Row("base", "image", gradientPng(0), Map.empty[String, String]),
      Row("jit", "image", gradientPng(4), Map.empty[String, String]),
      Row("inv", "image", gradientPng(0, invert = true), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val pairs = Multimodal.imageNearDupPairs(df, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.exists(p => Set(p._1, p._2) == Set("base", "jit")),
      s"jittered gradient must pair with base: ${pairs.mkString(",")}")
    assert(!pairs.exists(p => Set(p._1, p._2).contains("inv")),
      s"inverted gradient is ~64 bits away: ${pairs.mkString(",")}")
  }

  test("audioNearDupPairs: gain-scaled copy pairs at hamming 0, inverted envelope does not") {
    // 64 windows of 100 samples; loud/quiet 10× contrast per window
    def wave(loudEven: Boolean, amp: Double): Array[Short] =
      Array.tabulate(6400) { i =>
        val loud = ((i / 100) % 2 == 0) == loudEven
        val a = if (loud) amp else amp * 0.1
        (math.sin(i * 0.3) * a * 32767).toShort
      }
    val rows = Seq(
      Row("a1", "audio", realWav(wave(loudEven = true, 0.8)), Map.empty[String, String]),
      Row("a2", "audio", realWav(wave(loudEven = true, 0.4)), Map.empty[String, String]),
      Row("a3", "audio", realWav(wave(loudEven = false, 0.8)), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val pairs = Multimodal.audioNearDupPairs(df, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.map(p => Set(p._1, p._2)).toSet === Set(Set("a1", "a2")),
      s"only the gain-scaled copy may pair: ${pairs.mkString(",")}")
    assert(pairs.head._3 === 0L, "RMS-envelope bits are gain-invariant")
  }

  test("videoNearDupPairs: shared real keyframes pair, disjoint footage does not") {
    def pattern(vertical: Boolean, invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(16, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16) {
        val dark = if (vertical) x < 8 else y < 4
        val v = if (dark != invert) 30 else 220
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val A = pattern(vertical = true, invert = false)
    val B = pattern(vertical = false, invert = false)
    val C = pattern(vertical = true, invert = true)
    val D = pattern(vertical = false, invert = true)
    val rows = Seq(
      Row("v1", "video", mjpegAviFrom(Seq(A, B, A, B)), Map.empty[String, String]),
      Row("v2", "video", mjpegAviFrom(Seq(A, B)), Map.empty[String, String]), // trim
      Row("v3", "video", mjpegAviFrom(Seq(C, D, C, D)), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val pairs = Multimodal.videoNearDupPairs(df, everyNth = 1, maxFrames = 8,
        minShared = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.map(p => Set(p._1, p._2)).toSet === Set(Set("v1", "v2")),
      s"only the trimmed copy shares keyframes: ${pairs.mkString(",")}")
    assert(pairs.head._3 === 2L, "two distinct shared keyframe hashes")
  }

  test("imageNearDupPairs: identical bytes hash identical (hamming 0), fallback too") {
    val rnd = new scala.util.Random(9)
    val payload = Array.fill(300)(rnd.nextInt(256).toByte)
    val rows = Seq(
      Row("a", "image", Multimodal.encodeFake(10, 10, payload), Map.empty[String, String]),
      Row("b", "image", Multimodal.encodeFake(10, 10, payload.clone()), Map.empty[String, String]),
      Row("c", "image", Multimodal.encodeFake(10, 10,
        Array.fill(300)(rnd.nextInt(256).toByte)), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val pairs = Multimodal.imageNearDupPairs(df, maxDist = 0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs === Set(("a", "b", 0L)))
  }

  test("a corrupt RIFF size near 2^31 is clamped, not a task crash (r12)") {
    // untrusted input: Int arithmetic on the 32-bit chunk size
    // overflowed into negative offsets and threw from copyOfRange —
    // the walk must skip/clamp, never fail
    val b = new Array[Byte](64)
    "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
    b(4) = 56 // RIFF payload size: rest of the buffer (valid outer chunk)
    "AVI ".getBytes("US-ASCII").copyToArray(b, 8)
    "00dc".getBytes("US-ASCII").copyToArray(b, 12)
    // little-endian CORRUPT frame size 0x7FFFFFF0
    b(16) = 0xF0.toByte; b(17) = 0xFF.toByte
    b(18) = 0xFF.toByte; b(19) = 0x7F.toByte
    val frames = graft.ops.Multimodal.aviVideoChunks(b)
    assert(frames.length === 1, "clamped to the available bytes")
    assert(frames.head.length === 64 - 20)
    // size that would wrap the cursor itself (0xFFFFFFFF)
    val c = b.clone()
    c(16) = 0xFF.toByte; c(17) = 0xFF.toByte
    c(18) = 0xFF.toByte; c(19) = 0xFF.toByte
    assert(graft.ops.Multimodal.aviVideoChunks(c).length === 1)
  }

  test("sampleFrames validates everyNth/maxFrames driver-side (r12)") {
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.sampleFrames(assets, everyNth = 0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.sampleFrames(assets, everyNth = -1)
    }
  }
}
