package graft

import graft.ops.{Dedup, Evaluation, IvfIndex, VectorSearch}

class EvaluationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = withLogLevel(
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))

  test("recallAtK basics") {
    assert(Evaluation.recallAtK(Seq(1, 2, 3), Seq(1, 2, 3)) === 1.0)
    assert(Evaluation.recallAtK(Seq(1, 2, 3, 4), Seq(1, 2)) === 0.5)
    assert(Evaluation.recallAtK(Seq.empty[Int], Seq(1)) === 1.0)
  }

  test("minhash dedup achieves perfect pair metrics on identical-set dups") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val truth = Dedup.wordJaccardPairs(docs, "text", "doc_id", 0.999)
    val cand = Dedup.minhashDuplicates(docs, "text", "doc_id", 0.999,
      numHashes = 64, bands = 16, shingleSize = 1)
    val (p, r) = Evaluation.pairMetrics(truth, cand)
    assert(p === 1.0 && r === 1.0)
  }

  test("IVF recall@10 improves with nprobe and hits 1.0 at full probe") {
    val cents = IvfIndex.trainCentroids(emb, "embedding", nlist = 4, sampleSize = 300)
    val assigned = IvfIndex.assign(emb, "embedding", cents)
    val queries = emb.filter($"vec_id" < 8).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toArray))
    def meanRecall(nprobe: Int): Double = queries.map { case (_, q) =>
      val exact = VectorSearch.topK(emb, "embedding", q, 10, "vec_id")
        .select("vec_id").as[Long].collect().toSeq
      val approx = IvfIndex.topK(assigned, "embedding", cents, q, 10, "vec_id", nprobe)
        .select("vec_id").as[Long].collect().toSeq
      Evaluation.recallAtK(exact, approx)
    }.sum / queries.length
    val r1 = meanRecall(1)
    val rAll = meanRecall(4)
    assert(rAll === 1.0, s"full probe must be exact, got $rAll")
    assert(r1 <= rAll)
    assert(r1 > 0.3, s"nprobe=1 recall suspiciously low: $r1")
  }
}
