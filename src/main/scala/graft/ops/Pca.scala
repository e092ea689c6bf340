package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GramOuterSum

/**
 * Exact distributed covariance profile + driver-side PCA over an
 * embedding column.
 *
 * The distributed part is ONE pass: [[GramOuterSum]] aggregates the
 * exact 128-bit Gram matrix of the AUGMENTED scaled vector
 * (1, e7₀, …, e7_{d−1}), so a single map-side-combined aggregate
 * (fixed ~m²·17 B buffer per partition — count-class shuffle volume)
 * carries every moment: n at (0,0), first moments Σe7ᵢ in row 0,
 * second moments Σe7ᵢe7ⱼ elsewhere. n·Σxy − Σx·Σy then gives the
 * covariance numerator EXACTLY (BigInt driver math / HUGEINT in SQL) —
 * bit-reproducible under any partitioning, unlike a float syrk.
 *
 * The eigen-decomposition runs on the DRIVER on the d×d double
 * covariance (cyclic Jacobi): d is model-sized (≤ a few thousand),
 * d×d doubles are KBs — distributing it would add exchanges to shrink
 * microseconds. Only the moments pass touches the corpus.
 */
object Pca {

  /**
   * Exact moment rows (i, j, s) for 0 ≤ i ≤ j ≤ dim: s is the 128-bit
   * sum over the augmented index space (index 0 is the constant 1;
   * index p ≥ 1 is e7_{p−1} = round(v_{p−1}·scale)). decimal(38,0).
   */
  def gramMoments(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scale: Long = 10000000L): DataFrame = {
    require(dim > 0, "dim must be the embedding dimensionality (> 0)")
    val m = dim + 1
    val pairs: Seq[Seq[Int]] =
      for (i <- 0 until m; j <- i until m) yield Seq(i, j)
    df.filter(col(vecCol).isNotNull)
      .select(augmented(col(vecCol), scale).as("__aug"))
      .agg(GramOuterSum.gram128(col("__aug")).as("__g"))
      .select(posexplode(col("__g")).as(Seq("__idx", "s")))
      .withColumn("__ij", element_at(typedlit(pairs), col("__idx") + 1))
      .select(col("__ij").getItem(0).cast("long").as("i"),
        col("__ij").getItem(1).cast("long").as("j"), col("s"))
  }

  /** Fitted state: mean (original units), principal axes (rows,
    * descending eigenvalue), eigenvalues (covariance units), and the
    * total variance (= trace) for explained-variance ratios. */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double)

  /**
   * PCA fit: one exact moments pass ([[gramMoments]] shape, collected
   * as t = (d+1)(d+2)/2 decimals), covariance assembled in exact
   * BigInt arithmetic and converted to double ONCE per entry, then
   * cyclic Jacobi on the driver. Deterministic: the corpus-side sums
   * are integers (partition-order independent) and Jacobi runs a fixed
   * sweep order with a first-index tie-break on the eigenvalue sort.
   */
  def fit(df: DataFrame, vecCol: String, dim: Int, topK: Int,
      scale: Long = 10000000L): Model = {
    require(topK >= 1 && topK <= dim, "need 1 <= topK <= dim")
    val m = dim + 1
    val tri = df.filter(col(vecCol).isNotNull)
      .select(augmented(col(vecCol), scale).as("__aug"))
      .agg(GramOuterSum.gram128(col("__aug")).as("__g"))
      .collect()(0).getSeq[java.math.BigDecimal](0)
      .map(d => BigInt(d.toBigIntegerExact)).toArray
    require(tri.length == m * (m + 1) / 2, "unexpected gram triangle size")
    def at(i: Int, j: Int): BigInt = { // upper-triangle row-major
      val (a, b) = if (i <= j) (i, j) else (j, i)
      tri(a * m - a * (a - 1) / 2 + (b - a))
    }
    val n = at(0, 0)
    require(n > 0, "PCA needs at least one row")
    val nD = n.toDouble
    val s2 = scale.toDouble * scale.toDouble
    val mean = Array.tabulate(dim)(i => at(0, i + 1).toDouble / nD / scale.toDouble)
    // cov_ij = (n·Σxy − Σx·Σy) / n² — numerator exact, ONE rounding
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (n * at(i + 1, j + 1) - at(0, i + 1) * at(0, j + 1)).toDouble / (nD * nD) / s2
    }
    val (evals, evecs) = jacobi(cov)
    val order = evals.indices.sortBy(i => (-evals(i), i)).toArray
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    Model(
      mean,
      order.take(topK).map(k => orient(evecs.map(_(k)))),
      order.take(topK).map(evals),
      trace)
  }

  /** One axis's centered projection term — the shared arithmetic of
    * [[project]] and [[whiten]] (identical op order, so the whitened
    * value is exactly the projected value times its scale). */
  private def axisTerm(vecCol: String, axis: Array[Double],
      means: Array[Double]): Column =
    aggregate(
      zip_with(col(vecCol),
        typedlit(axis.zip(means).map { case (a, mu) => Seq(a, mu) }.toSeq),
        (x, am) => (x.cast("double") - am.getItem(1)) * am.getItem(0)),
      lit(0.0), (acc, v) => acc + v)

  /** Map-only projection onto a fitted model's top-k axes (doubles —
    * a serving transform, not a gate surface). */
  def project(df: DataFrame, vecCol: String, model: Model): Column =
    array(model.components.map(axisTerm(vecCol, _, model.mean)).toIndexedSeq: _*)

  /**
   * PCA WHITENING apply: project onto the model's components and scale
   * each coordinate by 1/√(λᵢ+eps) so the transformed corpus has unit
   * variance along every kept axis — the standard embedding
   * preprocessing before cosine dedup / retrieval (decorrelates
   * dimensions, stops dominant axes swamping the metric). Map-only
   * column over the scan, same envelope as [[project]]; the model is
   * driver-fit ([[fit]]) and rides as literals.
   */
  def whiten(df: DataFrame, vecCol: String, model: Model,
      eps: Double = 1e-12): Column = {
    val scales = model.eigenvalues.map(l =>
      1.0 / math.sqrt(math.max(l, 0.0) + eps))
    val terms = model.components.zip(scales).map { case (axis, s) =>
      axisTerm(vecCol, axis, model.mean) * lit(s)
    }
    array(terms.toIndexedSeq: _*)
  }

  /** Deterministic sign: first nonzero coordinate positive. */
  private def orient(v: Array[Double]): Array[Double] = {
    val k = v.indexWhere(x => math.abs(x) > 1e-12)
    if (k >= 0 && v(k) < 0) v.map(x => -x) else v
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS).
    * Fixed sweep order ⇒ deterministic; converges quadratically. */
  private[graft] def jacobi(
      a0: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scaleRef = math.max(1e-300, frobenius(a))
    while (off > tol * scaleRef && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def augmented(vec: Column, scale: Long): Column =
    concat(array(lit(1L)),
      graft.functions.ColumnMath.scaledLongs(vec, scale))
}
