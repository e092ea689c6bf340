package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.{VectorIndex, VectorSearch}

class VectorSearchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = withLogLevel(
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
  private lazy val q0: Array[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray

  test("topK returns k rows sorted desc, self-match first") {
    val r = VectorSearch.topK(emb, "embedding", q0, 5, "vec_id").collect()
    assert(r.length === 5)
    assert(r.head.getAs[Long]("vec_id") === 0L)
    val sims = r.map(_.getAs[Float]("similarity"))
    assert(math.abs(sims.head - 1f) < 1e-5)
    assert(sims.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("VectorIndex topK agrees with DataFrame topK exactly") {
    val df = VectorSearch.topK(emb, "embedding", q0, 10, "vec_id")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Float]("similarity")))
    val idx = VectorIndex.build[Long](emb, "vec_id", "embedding", q0.length, 2)
    val viaIndex = idx.topK(q0, 10)
    assert(viaIndex.map(_._1).toSeq === df.map(_._1).toSeq)
    assert(viaIndex.zip(df).forall { case ((_, a), (_, b)) => a == b },
      "scores must be bit-identical (same float32 kernel)")
  }

  test("VectorIndex topK ties break by id ascending on BOTH paths, independent of layout (r12)") {
    import spark.implicits._
    // five copies of the same vector spread across blocks: every score
    // ties, so a score-only heap resolved the winner by block order —
    // layout-dependent and diverging from the DataFrame tiers'
    // (desc similarity, asc id) contract
    val v = Array(0.6f, 0.8f)
    val dup = withLogLevel(Seq(
      (40L, v), (10L, v), (30L, v), (20L, v), (50L, v),
      (5L, Array(0.8f, 0.6f))
    ).toDF("vec_id", "embedding").repartition(3))
    val want = Seq(40L, 10L, 30L, 20L, 50L).sorted // ties: id asc
    val qv = Array(0.6f, 0.8f)
    val distributed = VectorIndex.build[Long](dup, "vec_id", "embedding", 2, 3)
    assert(distributed.topK(qv, 3).map(_._1).toSeq === want.take(3))
    val localIdx: graft.ops.VectorIndex[Long] =
      VectorIndex.build[Long](dup, "vec_id", "embedding", 2, 3)
        .persist().materialize()
    try assert(localIdx.topK(qv, 3).map(_._1).toSeq === want.take(3))
    finally localIdx.unpersist()
    // agreement with the DataFrame tier under the same ties
    val viaDf = VectorSearch.topK(dup, "embedding", qv, 3, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(viaDf === want.take(3))
  }

  test("chunked build crosses the 4096-row first-chunk boundary losslessly (r13)") {
    // the r13 streaming-slab build emits one small first chunk (4096
    // rows) then full-cap chunks; the unit corpora elsewhere never
    // exceed 4096 rows per partition, so the boundary was only
    // exercised by the bench. 5000 rows in ONE partition must split
    // 4096 + 904 with every (id, vector) preserved and topK identical
    // to the DataFrame tier.
    val rnd = new scala.util.Random(77)
    val rows = (0L until 5000L).map { id =>
      (id, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    }
    val df = withLogLevel(rows.toDF("vec_id", "embedding").coalesce(1))
    val idx = VectorIndex.build[Long](df, "vec_id", "embedding", 4, 1)
    val sizes = idx.blocks.map(b => b.ids.length).collect().toSeq
    assert(sizes === Seq(4096, 904), s"chunk split was $sizes")
    // data arrays trimmed to exactly rows*dim (persisted bytes == data)
    val dataSizes = idx.blocks.map(b => b.data.length).collect().toSeq
    assert(dataSizes === Seq(4096 * 4, 904 * 4))
    // ids survive in partition order across the boundary
    val allIds = idx.blocks.flatMap(_.ids).collect().toSeq
    assert(allIds === (0L until 5000L), "ids must survive chunking in order")
    val qv = rows(1234)._2
    val viaIdx = idx.topK(qv, 7).map(_._1).toSeq
    val viaDf = VectorSearch.topK(df, "embedding", qv, 7, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(viaIdx === viaDf)
    // no self-match-first claim: vectors are unnormalized, so raw-dot
    // ranking can put a larger-magnitude aligned vector above the query
    assert(viaIdx.contains(1234L) || viaIdx.size == 7)
  }

  test("VectorIndex topK rejects k <= 0 loudly (r12)") {
    val idx = VectorIndex.build[Long](emb, "vec_id", "embedding", q0.length, 2)
    val e = intercept[IllegalArgumentException](idx.topK(q0, 0))
    assert(e.getMessage.contains("k must be > 0"))
  }

  test("knnJoin / topKPerGroup reject a pre-existing similarity column (r12)") {
    val withSim = emb.withColumn("similarity", org.apache.spark.sql.functions.lit(0.0))
    intercept[IllegalArgumentException] {
      VectorSearch.knnJoin(withSim, "embedding", "vec_id",
        emb.limit(1), "embedding", "vec_id", 3)
    }
    intercept[IllegalArgumentException] {
      VectorSearch.topKPerGroup(withSim, "embedding", q0, 3, "vec_id", "vec_id")
    }
  }

  test("mmrRerank survives NaN relevance and zero-norm vectors (r12)") {
    import spark.implicits._
    val cands = withLogLevel(Seq(
      ("a", Array(1f, 0f), 0.9),
      ("b", Array(0f, 0f), 0.8),          // zero-norm: cosine NaN in the diversity term
      ("c", Array(Float.NaN, 1f), Double.NaN), // NaN relevance: filtered
      ("d", Array(0f, 1f), 0.7)
    ).toDF("id", "embedding", "rel"))
    val r = VectorSearch.mmrRerank(cands, "embedding", "id", "rel", k = 3)
      .select("id").as[String].collect().toSeq
    assert(r.length === 3 && !r.contains("c"), s"got $r")
    assert(r.head === "a")
  }

  test("index count and dim validation") {
    val idx = VectorIndex.build[Long](emb, "vec_id", "embedding", q0.length, 2)
    assert(idx.count() === emb.count())
    val e = intercept[IllegalArgumentException](idx.topK(Array(1f, 2f), 3))
    assert(e.getMessage.contains("same length"))
  }

  test("materialized small index scans driver-locally and agrees with the distributed scan") {
    val distributed = VectorIndex.build[Long](emb, "vec_id", "embedding", q0.length, 2)
    val localIdx: graft.ops.VectorIndex[Long] =
      VectorIndex.build[Long](emb, "vec_id", "embedding", q0.length, 2)
        .persist().materialize() // 500×64 floats ≪ LocalScanMaxFloats ⇒ local
    try {
      assert(localIdx.isLocal && !distributed.isLocal)
      assert(localIdx.count() === emb.count())
      val a = localIdx.topK(q0, 10).toSeq
      val b = distributed.topK(q0, 10).toSeq
      assert(a.map(_._1) === b.map(_._1))
      assert(a.map(_._2) === b.map(_._2), "same float32 kernel ⇒ bit-identical scores")
    } finally localIdx.unpersist()
  }

  test("thresholdSearch returns exactly rows above threshold") {
    val viaFilter = VectorSearch.thresholdSearch(emb, "embedding", q0, 0.3)
      .select("vec_id").as[Long].collect().toSet
    val viaScores = VectorSearch.scored(emb, "embedding", q0)
      .filter($"similarity" >= 0.3).select("vec_id").as[Long].collect().toSet
    assert(viaFilter === viaScores && viaFilter.contains(0L))
  }

  test("negativeFilterTopK drops rows similar to the negative vector") {
    val neg = emb.filter($"vec_id" === 1).select("embedding").head().getSeq[Float](0).toArray
    val res = VectorSearch.negativeFilterTopK(emb, "embedding", q0, neg, 0.1, 20, "vec_id")
    val negSims = res.withColumn("ns",
        VectorFunctions.dot_const_f32($"embedding", neg))
      .select("ns").as[Float].collect()
    assert(negSims.forall(_ <= 0.1f))
    assert(!res.select("vec_id").as[Long].collect().contains(1L))
  }

  test("knnJoin returns k matches per query, each list sorted") {
    val queries = emb.filter($"vec_id" < 3)
    val r = VectorSearch.knnJoin(emb, "embedding", "vec_id",
      queries, "embedding", "vec_id", 4).collect()
    assert(r.length === 12)
    val byQuery = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    byQuery.foreach { case (qid, rows) =>
      // self is the top match
      assert(rows.map(_.getAs[Float]("similarity")).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("topKPerGroup keeps at most k per group") {
    val r = VectorSearch.topKPerGroup(emb, "embedding", q0, 2, "label", "vec_id")
    val counts = r.groupBy("label").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 2))
  }

  test("lshTopK returns a subset consistent with brute force on its candidates") {
    val exact = VectorSearch.topK(emb, "embedding", q0, 5, "vec_id")
      .select("vec_id").as[Long].collect()
    val approx = VectorSearch.lshTopK(emb, "embedding", q0, 5, "vec_id",
      numPlanes = 8, maxHamming = 4)
    val ids = approx.select("vec_id").as[Long].collect()
    // self-match survives any LSH probe of its own bucket (hamming 0)
    assert(ids.contains(0L))
    assert(ids.length <= 5)
  }

  test("mmrRerank trades relevance for diversity; lambda=1 is pure relevance") {
    def unit(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // a and b are near-duplicates close to the query; c is distinct
    val cands = Seq(
      ("a", unit(5), 0.99), ("b", unit(6), 0.98), ("c", unit(-40), 0.80))
      .toDF("id", "vec", "rel")
    val diverse = graft.ops.VectorSearch
      .mmrRerank(cands, "vec", "id", "rel", k = 2, lambda = 0.5)
      .collect().sortBy(_.getLong(2)).map(_.getString(0)).toSeq
    assert(diverse === Seq("a", "c"),
      "MMR must skip the near-duplicate b in favor of the diverse c")
    val pure = graft.ops.VectorSearch
      .mmrRerank(cands, "vec", "id", "rel", k = 2, lambda = 1.0)
      .collect().sortBy(_.getLong(2)).map(_.getString(0)).toSeq
    assert(pure === Seq("a", "b"), "lambda=1 must reduce to relevance order")
    // rank column is 1-based selection order; k clamps to candidate count
    val all = graft.ops.VectorSearch
      .mmrRerank(cands, "vec", "id", "rel", k = 10, lambda = 0.5)
    assert(all.count() === 3)
  }

  test("mmrRerankExactE7 matches a brute-force integer greedy replica") {
    // independent local replica of the contract: top-N candidates by
    // exact e7 dot (ties id asc), then greedy num·rel − (den−num)·maxdiv
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def half(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val qe = q0.map(v => half(v.toDouble * 1e7))
    def e7(v: Array[Float]): Array[Long] = v.map(x => half(x.toDouble * 1e7))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rel = rows.map { case (id, v) => (id, e7(v), dot(e7(v), qe)) }
    val cand = rel.sortBy { case (id, _, r) => (-r, id) }.take(12)
    var remaining = cand.toList
    val maxDiv = scala.collection.mutable.HashMap.empty[Long, Long]
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (expect.length < 5) {
      val scoredCands = remaining.map { case (id, _, r) =>
        val s = if (expect.isEmpty) 10L * r else 7L * r - 3L * maxDiv(id)
        (id, s)
      }
      val bestId = scoredCands.minBy { case (id, s) => (-s, id) }._1
      val best = remaining.find(_._1 == bestId).get
      expect += ((best._1, best._3))
      remaining = remaining.filterNot(_._1 == bestId)
      remaining.foreach { case (id, v, _) =>
        val d = dot(v, best._2)
        if (!maxDiv.contains(id) || d > maxDiv(id)) maxDiv(id) = d
      }
    }
    val got = VectorSearch.mmrRerankExactE7(emb, "embedding", "vec_id", q0,
        numCandidates = 12, k = 5, lambdaNum = 7L, lambdaDen = 10L)
      .collect().sortBy(_.getLong(2))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expect.toSeq)
  }

  test("mmrRerankExactE7 skips exact-duplicate of the first pick") {
    // b is a BYTE-identical copy of a (maximal diversity penalty: its
    // max-div to the selected set is a·a = 1); the query must differ
    // from a, else rel ≡ div for every candidate and λ=1/2 cancels
    // them all into an exact tie. With this geometry c's lower div
    // (0.6) beats its lower rel (0.8) at λ=1/2.
    val q = Array(1f, 0f)
    val a = Array(0.96f, 0.28f); val c = Array(0.8f, -0.6f)
    val cands = Seq((1L, a), (2L, a), (3L, c)).toDF("vec_id", "embedding")
    val picked = VectorSearch.mmrRerankExactE7(cands, "embedding", "vec_id",
        q, numCandidates = 3, k = 2, lambdaNum = 1L, lambdaDen = 2L)
      .collect().sortBy(_.getLong(2)).map(_.getLong(0)).toSeq
    assert(picked === Seq(1L, 3L))
  }

  test("topK plan is TakeOrderedAndProject with no shuffle") {
    val plan = VectorSearch.topK(emb, "embedding", q0, 5, "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
    assert(!plan.contains("Exchange"), s"top-k must not shuffle; plan was:\n$plan")
  }

  test("knnJoinIVF with nProbe = cells ≡ exact integer-dot brute force") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 20 === 0) // 3 queries
    val got = VectorSearch.knnJoinIVF(corpus, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 4, cells = 3, iterations = 2,
        nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force on the same e7 integers
    val e7 = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e7))
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map(p => p._1 * p._2).sum
    val want = Seq(0L, 20L, 40L).flatMap { qid =>
      val qe = e7.find(_._1 == qid).get._2
      e7.map { case (cid, ce) => (qid, cid, dot(qe, ce)) }
        .sortBy { case (_, cid, s) => (-s, cid) }.take(4)
    }.toSet
    assert(got === want, "probing every cell must equal brute force")
  }

  test("knnJoinIVF probes prune cells but keep exact in-cell ranking") {
    // three tight orthogonal clusters: nProbe=1 must find the
    // same-cluster neighbors exactly
    val rnd = new scala.util.Random(37)
    def near(axis: Int): Array[Float] =
      Array.tabulate(6)(i =>
        (if (i == axis) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.02f)
    val rows = (0 until 30).map(i => (i.toLong, near(i % 3)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val res = VectorSearch.knnJoinIVF(corpus, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5, cells = 3, iterations = 2,
        nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.length === 15)
    // every returned neighbor is in the query's own angular cluster
    assert(res.forall { case (q, c) => c % 3 == q % 3 },
      s"cross-cluster neighbor leaked: ${res.mkString(",")}")
  }

  test("hardNegatives: top-k excluding self and positives ≡ brute force") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 20 === 0)
    val positives = queries.select($"vec_id".as("query_id"),
      ($"vec_id" + 2).as("pos_id"))
    val got = VectorSearch.hardNegatives(corpus, "embedding", "vec_id",
        queries, "embedding", "vec_id", positives,
        k = 4, maxPositives = 1, cells = 3, iterations = 2, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e7 = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e7)) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map(p => p._1 * p._2).sum
    val want = Seq(0L, 20L, 40L).flatMap { qid =>
      val qe = e7.find(_._1 == qid).get._2
      e7.filter { case (cid, _) => cid != qid && cid != qid + 2 }
        .map { case (cid, ce) => (qid, cid, dot(qe, ce)) }
        .sortBy { case (_, cid, s) => (-s, cid) }.take(4)
    }.toSet
    assert(got === want)
  }

  test("knnJoinIVF plan: cell equi-join + partial bounded-heap, no window") {
    val plan = withLogLevel {
      VectorSearch.knnJoinIVF(emb, "embedding", "vec_id",
        emb.filter($"vec_id" < 3), "embedding", "vec_id",
        k = 3, cells = 2, iterations = 1, nProbe = 1)
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topk_rows"),
      s"map-side heap must bound the exchange:\n$plan")
  }
}
