package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, VectorSearch}

class PqSpec extends SparkSuite {
  import spark.implicits._

  private def norm(xs: Array[Float]): Array[Float] =
    graft.functions.VectorFunctions.normalize(xs)

  test("encode assigns each subspace to its nearest centroid (hand case)") {
    // dim=4, m=2, k=2: subspace centroids chosen so assignment is obvious
    val cb = Pq.Codebook(m = 2, k = 2, subDim = 2, flat = Array(
      1.0, 0.0, /* j=0 c=0 */ 0.0, 1.0, /* j=0 c=1 */
      -1.0, 0.0, /* j=1 c=0 */ 0.0, -1.0 /* j=1 c=1 */))
    val df = Seq(
      (1L, Array(0.9f, 0.1f, 0.1f, -0.9f)), // → (c0, c1)
      (2L, Array(0.1f, 0.9f, -0.9f, 0.1f))  // → (c1, c0)
    ).toDF("id", "v")
    val codes = Pq.encode(df, "v", cb).select("id", "pq_code")
      .as[(Long, Array[Int])].collect().toMap
    assert(codes(1L).toSeq === Seq(0, 1))
    assert(codes(2L).toSeq === Seq(1, 0))
  }

  test("adc score equals the sum of query·assigned-centroid dots") {
    val cb = Pq.Codebook(m = 2, k = 2, subDim = 2, flat = Array(
      1.0, 0.0, 0.0, 1.0, -1.0, 0.0, 0.0, -1.0))
    val df = Seq((1L, Array(0.9f, 0.1f, 0.1f, -0.9f))).toDF("id", "v")
    val q = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val score = Pq.adcTopK(Pq.encode(df, "v", cb), cb, q, 1, "id")
      .head().getDouble(1)
    // assigned: j0→(1,0), j1→(0,−1): q·c = 0.5 + (−0.5) = 0.0
    assert(score === (0.5 * 1.0 + 0.5 * 0.0) + (0.5 * 0.0 + 0.5 * -1.0))
  }

  test("codes stay in [0, k) and length m at corpus scale") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Pq.randomCodebook(dim = 64, m = 8, k = 16, seed = 7L)
    val codes = Pq.encode(emb, "embedding", cb)
      .select("pq_code").as[Array[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("trained codebook recovers exact top-k on separated clusters") {
    val rnd = new scala.util.Random(3)
    // 4 tight clusters in d=8 around orthogonal axes
    val vecs = (0 until 200).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 4) = 1.0f
      (i.toLong, norm(base.map(x => x + rnd.nextFloat() * 0.05f)))
    }.toDF("id", "v")
    val cb = Pq.train(vecs, "v", dim = 8, m = 2, k = 8, sampleSize = 200)
    val enc = Pq.encode(vecs, "v", cb).persist()
    val q = norm(Array(1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f))
    val approx = Pq.adcTopK(enc, cb, q, 20, "id")
      .select("id").as[Long].collect()
    // Vectors of one cluster collapse onto the same code, so ADC cannot
    // rank WITHIN a cluster (that's the rerank path's job) — but every
    // retrieved doc must come from the query's cluster (id ≡ 0 mod 4).
    assert(approx.length === 20)
    assert(approx.forall(_ % 4 == 0),
      s"retrieved outside the query cluster: ${approx.filter(_ % 4 != 0).toSeq}")
    enc.unpersist()
  }

  test("rerank path returns exact float scores for PQ candidates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val cb = Pq.train(emb, "embedding", dim = 64, m = 8, k = 16, sampleSize = 500)
    val enc = Pq.encode(emb, "embedding", cb)
    val rr = Pq.adcTopKRerank(enc, "embedding", cb, q, k = 5, idCol = "vec_id",
      rerankK = 50).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = VectorSearch.topK(emb, "embedding", q, 50, "vec_id", precision = "f64")
      .select(col("vec_id"), col("similarity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // rerank scores are EXACT — every returned pair must appear in the
    // brute-force top-50 with the identical score
    rr.foreach(p => assert(brute.contains(p), s"$p not in brute top-50"))
  }

  test("ADC scan plan is map-only scoring + bounded top-k, no join") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Pq.randomCodebook(dim = 64, m = 8, k = 16, seed = 7L)
    val q = Array.fill(64)(0.1f)
    val p = Pq.adcTopK(Pq.encode(emb, "embedding", cb), cb, q, 10, "vec_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Exchange"), p)
  }

  test("encode rejects a vector whose length does not match the codebook") {
    val cb = Pq.randomCodebook(dim = 8, m = 2, k = 4, seed = 1L)
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      Pq.encode(df, "v", cb).collect()
    }
    assert(e.getMessage != null)
  }
}
