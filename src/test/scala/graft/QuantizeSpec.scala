package graft

import org.apache.spark.sql.functions._

import graft.ops.{Quantize, VectorSearch}

class QuantizeSpec extends SparkSuite {
  import spark.implicits._

  private def norm(xs: Array[Float]): Array[Float] = {
    val n = math.sqrt(xs.map(x => x.toDouble * x).sum).toFloat
    xs.map(_ / n)
  }

  private lazy val vecs = withLogLevel(Seq(
    (0L, norm(Array(1.0f, 0.0f, 0.0f, 0.0f))),
    (1L, norm(Array(0.9f, 0.1f, 0.0f, 0.1f))),
    (2L, norm(Array(0.0f, 1.0f, 0.0f, 0.0f))),
    (3L, norm(Array(0.5f, 0.5f, 0.5f, 0.5f))),
    (4L, norm(Array(-1.0f, 0.0f, 0.1f, 0.0f))),
    (5L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding"))

  test("quantize: values land in [-127, 127] and the max |x| maps to ±127") {
    val q = Quantize.quantize(vecs, "embedding")
    val rows = q.select("vec_id", "qvec").as[(Long, Array[Int])].collect().toMap
    rows.values.foreach(v => assert(v.forall(x => x >= -127 && x <= 127)))
    assert(rows(0L).max === 127)          // max element hits the full range
    assert(rows(4L).min === -127)         // negative extreme maps to -127
  }

  test("quantize: zero vector gets scale 0 and all-zero qvec") {
    val r = Quantize.quantize(vecs, "embedding")
      .filter(col("vec_id") === 5).select("qscale", "qvec")
      .as[(Double, Array[Int])].head()
    assert(r._1 === 0.0 && r._2.forall(_ == 0))
  }

  test("dequantization error is bounded by scale/2 per element") {
    val rows = Quantize.quantize(vecs, "embedding")
      .select("embedding", "qscale", "qvec")
      .as[(Array[Float], Double, Array[Int])].collect()
    rows.foreach { case (emb, scale, qv) =>
      emb.indices.foreach { i =>
        assert(math.abs(emb(i).toDouble - qv(i) * scale) <= scale / 2 + 1e-12)
      }
    }
  }

  test("quantizeQuery uses HALF_UP (away from zero), matching the column path") {
    val (qv, scale) = Quantize.quantizeQuery(Array(1.0f, -1.0f, 0.5f, 0.0f))
    assert(scale === 1.0 / 127.0)
    assert(qv(0) === 127 && qv(1) === -127)
    assert(qv(2) === 64) // 63.5 rounds away from zero to 64
    val col_ = Quantize.quantize(
      Seq((0L, Array(1.0f, -1.0f, 0.5f, 0.0f))).toDF("vec_id", "embedding"),
      "embedding").select("qvec").as[Array[Int]].head()
    assert(col_.toSeq === qv.toSeq)
  }

  test("quantized top-k recovers the exact top-k on separated vectors") {
    val q = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val quantized = Quantize.quantize(vecs, "embedding")
    val approx = Quantize.quantizedTopK(quantized, q, k = 3, idCol = "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSearch.topK(vecs, "embedding", q, 3, "vec_id",
      precision = "f64").select("vec_id").as[Long].collect().toSeq
    assert(approx === exact)
  }

  test("quantized similarity approximates the float dot within quant error") {
    val q = norm(Array(0.6f, 0.8f, 0.0f, 0.0f))
    val quantized = Quantize.quantize(vecs, "embedding")
    val qs = Quantize.quantizedTopK(quantized, q, k = 6, idCol = "vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val es = VectorSearch.topK(vecs, "embedding", q, 6, "vec_id",
      precision = "f64")
      .collect().map(r => r.getLong(0) -> (r.getAs[Any]("similarity") match {
        case d: Double => d; case f: Float => f.toDouble
      })).toMap
    es.foreach { case (id, exact) =>
      // elementwise error ≤ scale/2 per side ⇒ dot error ≤ d·(combined)
      assert(math.abs(qs(id) - exact) < 0.02, s"id=$id q=${qs(id)} e=$exact")
    }
  }

  test("rerank path returns exact float scores for the quantized candidates") {
    val q = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val quantized = Quantize.quantize(vecs, "embedding")
    val rr = Quantize.quantizedTopKRerank(quantized, "embedding", q, k = 2,
      idCol = "vec_id", rerankK = 4)
    val exact = VectorSearch.topK(vecs, "embedding", q, 2, "vec_id",
      precision = "f64").select(col("vec_id"), col("similarity"))
    assert(rr.collect().map(_.toSeq).toSeq === exact.collect().map(_.toSeq).toSeq)
  }

  test("quantized scan plan reads qvec/qscale only — never the float column") {
    val quantized = Quantize.quantize(vecs, "embedding")
    // materialize as parquet so column pruning is observable in the scan
    val dir = java.nio.file.Files.createTempDirectory("qz").toString
    quantized.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val plan = Quantize.quantizedTopK(reread, Array(1.0f, 0.0f, 0.0f, 0.0f),
      k = 3, idCol = "vec_id").queryExecution.executedPlan.toString
    assert(!plan.contains("embedding:array"),
      s"quantized scan must prune the float embedding column:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hammingTopK ≡ per-bit sign disagreement count, id tie-break") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val q = rows(5)._2
    val got = Quantize.hammingTopK(rows.toDF("vec_id", "embedding"),
        "embedding", q, k = 7, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = rows.map { case (id, v) =>
      id -> v.zip(q).count { case (a, b) => (a > 0) != (b > 0) }.toLong
    }.sortBy { case (id, h) => (h, id) }.take(7)
    assert(got === want)
    assert(got.head === ((5L, 0L)), "the query row itself is hamming 0")
  }

  test("hammingTopK: sign_bits64 raises above 64 dims") {
    val df = Seq((1L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Quantize.hammingTopK(df, "embedding", Array.fill(65)(1.0f),
        k = 1, idCol = "vec_id").collect()
    }
    assert(e.getMessage.contains("64") || e.getCause != null)
  }

  test("hamming scan is a pure TakeOrderedAndProject — no exchange") {
    val plan = Quantize.hammingTopK(vecs, "embedding",
        Array(1.0f, 0.0f, 0.0f, 0.0f), k = 3, idCol = "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"no shuffle expected:\n$plan")
  }

  test("quantizeQuery rejects an empty query with a diagnostic error (r12)") {
    val e = intercept[IllegalArgumentException] {
      graft.ops.Quantize.quantizeQuery(Array.emptyFloatArray)
    }
    assert(e.getMessage.contains("non-empty"))
  }
}
