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

  test("meanRecallAtK averages per-query recall; empty truth fails loudly") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("query_id", "vec_id")
    assert(Evaluation.meanRecallAtK(exact, approx) === 0.75) // (1.0+0.5)/2
    val e = intercept[IllegalArgumentException] {
      Evaluation.meanRecallAtK(exact.filter($"query_id" < 0), approx)
    }
    assert(e.getMessage.contains("no queries"))
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

  test("lshRecallReport: full hamming budget is exact (recall 1.0 everywhere)") {
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Evaluation.lshRecallReport(small, "embedding", "vec_id",
      dim = 64, numQueries = 6, k = 5, numPlanes = 12, maxHamming = 12)
      .collect()
    assert(got.length === 6)
    got.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      assert(r.getAs[Long]("hits") === 5L)
      assert(r.getAs[Long]("recall_e6") === 1000000L)
    }
  }

  test("lshMrrReport: full hamming budget ranks the true NN first everywhere") {
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Evaluation.lshMrrReport(small, "embedding", "vec_id",
      dim = 64, numQueries = 6, numPlanes = 12, maxHamming = 12).collect()
    assert(got.length === 6)
    got.foreach { r =>
      assert(r.getAs[Long]("found") === 1L)
      assert(r.getAs[Long]("rank") === 1L)
      assert(r.getAs[Long]("rr_e6") === 1000000L)
    }
  }

  test("lshMrrReport equals a BigInt brute-force replica") {
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = small.select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toArray))
    val planes = VectorSearch.randomPlanes(12, 64, 42L)
    def e7(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 10000000L))
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      a.indices.foldLeft(BigInt(0))((s, i) => s + BigInt(a(i)) * b(i))
    val sigs = rows.map { case (id, v) =>
      id -> VectorSearch.signatureOf(v, planes) }.toMap
    val vecs = rows.map { case (id, v) => id -> e7(v) }.toMap
    val expected = rows.filter(_._1 < 6).sortBy(_._1).map { case (qid, _) =>
      val q = vecs(qid)
      // self excluded on BOTH sides (r12): with self included the true
      // top-1 was the query itself and the metric was vacuously perfect
      val ranked = rows.map(_._1).filter(_ != qid)
        .map(cid => (dot(q, vecs(cid)), cid))
        .sortBy { case (s, cid) => (-s, cid) }
      val (s1, c1) = ranked.head
      val cands = rows.map(_._1).filter(cid => cid != qid &&
        java.lang.Long.bitCount(sigs(cid) ^ sigs(qid)) <= 2)
        .map(cid => (dot(q, vecs(cid)), cid))
      val found = cands.exists(_._2 == c1)
      val better = cands.count { case (s, cid) =>
        s > s1 || (s == s1 && cid < c1) }
      val rank = if (found) better + 1L else 0L
      (qid, if (found) 1L else 0L, rank,
        if (found) 1000000L / (better + 1) else 0L)
    }
    val got = Evaluation.lshMrrReport(small, "embedding", "vec_id",
      dim = 64, numQueries = 6, numPlanes = 12, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
  }

  test("lshRecallReport equals a BigInt brute-force replica") {
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = small.select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toArray))
    val planes = VectorSearch.randomPlanes(12, 64, 42L)
    def e7(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 10000000L))
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      a.indices.foldLeft(BigInt(0))((s, i) => s + BigInt(a(i)) * b(i))
    val sigs = rows.map { case (id, v) =>
      id -> VectorSearch.signatureOf(v, planes) }.toMap
    val vecs = rows.map { case (id, v) => id -> e7(v) }.toMap
    val k = 5
    val expected = rows.filter(_._1 < 6).sortBy(_._1).map { case (qid, _) =>
      val q = vecs(qid)
      def topk(cands: Seq[Long]): Set[Long] = cands
        .map(cid => (dot(q, vecs(cid)), cid))
        .sortBy { case (s, cid) => (-s, cid) }.take(k).map(_._2).toSet
      // self excluded on BOTH sides (r12) — see the MRR replica
      val exact = topk(rows.map(_._1).filter(_ != qid).toSeq)
      val cands = rows.map(_._1).filter(cid => cid != qid &&
        java.lang.Long.bitCount(sigs(cid) ^ sigs(qid)) <= 2).toSeq
      val approx = topk(cands)
      val hits = exact.intersect(approx).size.toLong
      (qid, k.toLong, hits, hits * 1000000L / k)
    }
    val got = Evaluation.lshRecallReport(small, "embedding", "vec_id",
      dim = 64, numQueries = 6, k = k, numPlanes = 12, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
  }
}
