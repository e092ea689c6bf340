package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca

class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("gramMoments ≡ brute-force BigInt outer products") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.25f, 2f)),
      (2L, Array(0.1f, 0.2f, -0.3f)),
      (3L, Array(-1f, 0f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Pca.gramMoments(df, "embedding", dim = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        BigInt(r.getDecimal(2).toBigIntegerExact))
      .toMap
    val aug = vecs.map { case (_, v) =>
      1L +: v.map(x => math.round(x.toDouble * 1e7))
    }
    for (i <- 0 to 3; j <- i to 3) {
      val want = aug.map(a => BigInt(a(i)) * BigInt(a(j))).sum
      assert(got((i.toLong, j.toLong)) === want, s"($i,$j)")
    }
    assert(got.size === 10)
  }

  test("gram aggregate raises on mixed vector lengths") {
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.gramMoments(df, "embedding", dim = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("jacobi diagonalizes a known symmetric matrix") {
    // eigenvalues of [[2,1],[1,2]] are 3 and 1
    val (evals, evecs) = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(evals.sorted.zip(Array(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // columns orthonormal
    val dot01 = evecs(0)(0) * evecs(0)(1) + evecs(1)(0) * evecs(1)(1)
    assert(math.abs(dot01) < 1e-12)
  }

  test("fit recovers planted principal directions and variance order") {
    // x = a·u + b·w with Var(a) >> Var(b); u, w orthogonal unit axes in R^6
    val u = Array(1.0, 0, 0, 1, 0, 0).map(_ / math.sqrt(2))
    val w = Array(0.0, 1, 0, 0, -1, 0).map(_ / math.sqrt(2))
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { i =>
      val a = (rnd.nextDouble() * 2 - 1) * 3.0   // sd ~ 1.73
      val b = (rnd.nextDouble() * 2 - 1) * 0.5   // sd ~ 0.29
      (i.toLong, Array.tabulate(6)(k =>
        (a * u(k) + b * w(k) + 10.0).toFloat))   // +10: mean must be removed
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 6, topK = 2)

    def absCos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map(p => p._1 * p._2).sum
      math.abs(d) / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    assert(absCos(model.components(0), u) > 0.99,
      s"top axis must align with u: ${model.components(0).mkString(",")}")
    assert(absCos(model.components(1), w) > 0.99)
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.mean.forall(m => math.abs(m - 10.0) < 0.2))
    // planted model is rank-2: top-2 explained variance ≈ 100%
    val explained = model.eigenvalues.sum / model.totalVariance
    assert(explained > 0.999, s"explained=$explained")
  }

  test("fit is partitioning-invariant (exact integer moments)") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(5)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val m1 = Pca.fit(df.repartition(1), "embedding", dim = 5, topK = 3)
    val m2 = Pca.fit(df.repartition(13), "embedding", dim = 5, topK = 3)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
  }

  test("project centers the data and lands on the planted axis") {
    val u = Array(1.0, 0, 0, 0)
    val rows = (0 until 64).map { i =>
      val a = (i % 16) - 7.5
      (i.toLong, Array.tabulate(4)(k => (a * u(k) + 5.0).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 4, topK = 1)
    val proj = df.select(col("vec_id"),
        Pca.project(df, "embedding", model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // projection of row i is ±(a_i − mean_a); spread must match exactly
    val vals = rows.map { case (id, _) => proj(id)(0) }
    assert(math.abs(vals.max - 7.5) < 1e-3 && math.abs(vals.min + 7.5) < 1e-3)
  }

  test("whiten yields unit variance and zero correlation on the fit corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 4
    val model = Pca.fit(emb, "embedding", dim = 64, topK = k)
    val w = emb.select(Pca.whiten(emb, "embedding", model).as("w"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = w.length.toDouble
    val mean = Array.tabulate(k)(i => w.map(_(i)).sum / n)
    // covariance (1/n convention, matching fit) must be ≈ identity
    for (i <- 0 until k; j <- i until k) {
      val c = w.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      if (i == j) assert(math.abs(c - 1.0) < 0.01, s"var axis $i = $c")
      else assert(math.abs(c) < 0.01, s"cov($i,$j) = $c")
    }
  }
}
