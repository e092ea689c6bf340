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
}
