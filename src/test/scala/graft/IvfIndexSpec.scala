package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, SkewJoin, VectorSearch}

class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = withLogLevel(
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))
  private lazy val q0: Array[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray

  test("centroid training is deterministic and returns nlist vectors") {
    val c1 = IvfIndex.trainCentroids(emb, "embedding", nlist = 4, sampleSize = 200)
    val c2 = IvfIndex.trainCentroids(emb, "embedding", nlist = 4, sampleSize = 200)
    assert(c1.length === 4)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  test("centroid training is layout-invariant when the sample fraction < 1") {
    // sample() membership came from a per-partition RNG, so a 3-file and
    // an 8-file copy of the same corpus trained different centroids —
    // exactly what a cluster scale-up changes. The hash-threshold filter
    // makes membership a pure function of the data.
    val n = emb.count().toInt
    val size = math.max(10, n / 5) // forces frac ≈ 0.24 < 1
    val c3 = IvfIndex.trainCentroids(emb.repartition(3), "embedding",
      nlist = 4, sampleSize = size)
    val c8 = IvfIndex.trainCentroids(emb.repartition(8), "embedding",
      nlist = 4, sampleSize = size)
    assert(c3.map(_.toSeq).toSeq === c8.map(_.toSeq).toSeq)
  }

  test("duplicate-heavy corpora train on distinct vectors (threshold-collapse fallback fires)") {
    // 2000 rows over 20 distinct embeddings, sampleSize 500: frac ≈ 0.3,
    // and the value-level threshold passes only ~frac·20 ≈ 6 distinct
    // vectors — far under the quota — so the full-corpus fallback MUST
    // fire (20 < 500 keeps it under quota too: the final sample is all
    // 20 distinct vectors). Training must neither crash nor collapse,
    // and the result must be layout-invariant AND multiplicity-invariant:
    // the same 20 distinct vectors with wildly skewed copy counts train
    // the same centroids as one copy each, because the sample is a pure
    // function of the distinct-value set.
    val base = (0 until 20).map { i =>
      graft.functions.VectorFunctions.normalize(
        Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    }
    val dup = (0 until 2000).map(r => Tuple1(base(r % 20))).toDF("embedding")
    val skewed = (0 until 2000).map(r => Tuple1(base(if (r < 1981) 0 else r - 1980)))
      .toDF("embedding")
    val one = base.map(Tuple1(_)).toDF("embedding")
    val c3 = IvfIndex.trainCentroids(dup.repartition(3), "embedding",
      nlist = 4, sampleSize = 500)
    val c8 = IvfIndex.trainCentroids(dup.repartition(8), "embedding",
      nlist = 4, sampleSize = 500)
    val cSkew = IvfIndex.trainCentroids(skewed, "embedding",
      nlist = 4, sampleSize = 500)
    val cOne = IvfIndex.trainCentroids(one, "embedding",
      nlist = 4, sampleSize = 500)
    assert(c3.length === 4)
    assert(c3.map(_.toSeq).toSeq === c8.map(_.toSeq).toSeq)
    assert(c3.map(_.toSeq).toSeq === cSkew.map(_.toSeq).toSeq)
    assert(c3.map(_.toSeq).toSeq === cOne.map(_.toSeq).toSeq)
  }

  test("every row lands in exactly one cell; cells cover the corpus") {
    val cents = IvfIndex.trainCentroids(emb, "embedding", nlist = 4, sampleSize = 200)
    val assigned = IvfIndex.assign(emb, "embedding", cents)
    assert(assigned.count() === emb.count())
    val cells = assigned.select("__cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet) && cells.nonEmpty)
  }

  test("probing all cells reproduces exact brute-force top-k") {
    val cents = IvfIndex.trainCentroids(emb, "embedding", nlist = 4, sampleSize = 200)
    val assigned = IvfIndex.assign(emb, "embedding", cents)
    val ivf = IvfIndex.topK(assigned, "embedding", cents, q0, 10, "vec_id", nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSearch.topK(emb, "embedding", q0, 10, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf === exact)
  }

  test("nprobe=1 finds the self-match (its own cell) with partial recall") {
    val cents = IvfIndex.trainCentroids(emb, "embedding", nlist = 4, sampleSize = 200)
    val assigned = IvfIndex.assign(emb, "embedding", cents)
    val ids = IvfIndex.topK(assigned, "embedding", cents, q0, 10, "vec_id", nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(ids.contains(0L), "query's own cell must contain the self-match")
    assert(ids.length <= 10)
  }

  test("salted join equals plain join results on a skewed key") {
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
      .toDF("k", "v")
    val right = Seq(("hot", 10), ("a", 20), ("c", 30)).toDF("k", "w")
    val plain = left.join(right, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", saltFactor = 4)
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted join rejects right/full outer (replicas would duplicate unmatched rows)") {
    val left = Seq(("a", 1)).toDF("k", "v")
    val right = Seq(("a", 10), ("orphan", 20)).toDF("k", "w")
    Seq("right_outer", "full_outer", "full").foreach { jt =>
      val e = intercept[IllegalArgumentException](
        SkewJoin.saltedJoin(left, right, "k", 4, jt))
      assert(e.getMessage.contains("inner/cross/left"), jt)
    }
    // left outer is fine: unmatched LEFT rows carry one salt value
    val lo = SkewJoin.saltedJoin(left.union(Seq(("solo", 5)).toDF("k", "v")),
      right, "k", 4, "left_outer").collect()
    assert(lo.length === 2)
  }

  test("assign excludes null vectors from the cell layout (r12)") {
    import spark.implicits._
    // a null vector's cell dot is null; greatest's struct tie-break
    // previously piled every embedding-less row into cell 0 of the
    // durable layout
    val withNulls = withLogLevel(Seq(
      (1L, Some(Array(1f, 0f))), (2L, None: Option[Array[Float]]),
      (3L, Some(Array(0f, 1f)))
    ).toDF("vec_id", "embedding"))
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    val assigned = graft.ops.IvfIndex.assign(withNulls, "embedding", cents)
    assert(assigned.count() === 2, "null-vector rows excluded")
    assert(assigned.filter(col("vec_id") === 2L).count() === 0)
  }
}
