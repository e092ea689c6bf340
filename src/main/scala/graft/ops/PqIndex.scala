package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.{pq_adc, pq_encode}

/**
 * Product quantization (Jégou et al., TPAMI 2011): the 64×-compression
 * ANN tier above [[Quantize]]'s int8. The vector splits into `m`
 * subspaces; each subvector is replaced by the index of its nearest
 * codebook centroid, so a d=1536 float32 embedding stores as `m` small
 * ints. Queries score with ADC (asymmetric distance computation): one
 * m×k lookup table of query·centroid dot products built driver-side per
 * query, then each row costs `m` table lookups — no float math on the
 * corpus at all.
 *
 * Scale shape: encoding is a map-only codegen'd kernel; the encoded
 * corpus scan reads `pq_code` only (m ints/row vs d floats); scoring is
 * a lookup-sum inside whole-stage codegen feeding a bounded top-k
 * (TakeOrderedAndProject). Training is driver-side Lloyd iterations on a
 * bounded sample, like [[IvfIndex]].
 */
object Pq {

  /** Flat `[m][k][subDim]` row-major codebook. All doubles: encode and
    * ADC arithmetic is double end-to-end, so external engines replay it
    * exactly. */
  final case class Codebook(m: Int, k: Int, subDim: Int, flat: Array[Double]) {
    require(flat.length == m * k * subDim, "codebook shape mismatch")
    def dim: Int = m * subDim
    def centroid(j: Int, c: Int): Array[Double] =
      java.util.Arrays.copyOfRange(flat, (j * k + c) * subDim, (j * k + c + 1) * subDim)
  }

  /** Deterministic untrained codebook (uniform in [-1, 1]) — for tests
    * and externally-replayable pipelines; `train` gives better recall. */
  def randomCodebook(dim: Int, m: Int, k: Int, seed: Long): Codebook = {
    require(dim % m == 0, "dim must be divisible by m")
    val rnd = new java.util.Random(seed)
    Codebook(m, k, dim / m,
      Array.fill(m * k * (dim / m))(rnd.nextDouble() * 2 - 1))
  }

  /**
   * Per-subspace Lloyd k-means on a bounded driver-side sample
   * (deterministic: first-k init, fixed iteration count, double math).
   * `sampleSize` caps driver memory exactly like IVF training.
   */
  def train(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      sampleSize: Int = 10000,
      iters: Int = 10,
      seed: Long = 42L): Codebook = {
    // the shared seeded-distinct sample (IvfIndex.seededDistinctSample):
    // the previous lexicographic orderBy prefix was layout-invariant but
    // BIASED (every sampled vector shared minimal leading components,
    // degrading codebook coverage) and duplicate-fragile (a dup-heavy
    // corpus filled the whole sample with copies of the smallest
    // vectors, collapsing every subspace codebook onto a handful of
    // points) — the same two defects the IVF training fix removed; one
    // definition now serves IVF, PQ, and IVF-PQ residuals.
    val sample = IvfIndex.seededDistinctSample(df, vecCol, sampleSize, seed)
      .map(_.map(_.toDouble))
    trainOnSamples(sample, dim, m, k, iters)
  }

  /** Per-subspace Lloyd on in-memory samples — shared by [[train]] and
    * the IVF-PQ residual training. Deterministic: first-k init, fixed
    * iterations, double math. */
  def trainOnSamples(
      sample: Array[Array[Double]],
      dim: Int,
      m: Int,
      k: Int,
      iters: Int = 10): Codebook = {
    require(dim % m == 0, "dim must be divisible by m")
    val subDim = dim / m
    require(sample.nonEmpty, "empty training sample")
    val flat = new Array[Double](m * k * subDim)
    var j = 0
    while (j < m) {
      val subs = sample.map { v =>
        Array.tabulate(subDim)(i => v(j * subDim + i))
      }
      val cents = Array.tabulate(k)(c => subs(c % subs.length).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < subDim) { val t = s(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += s(i); i += 1 }
          counts(best) += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var i = 0
            while (i < subDim) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
          } // empty cluster keeps its previous centroid
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        System.arraycopy(cents(c), 0, flat, (j * k + c) * subDim, subDim)
        c += 1
      }
      j += 1
    }
    Codebook(m, k, subDim, flat)
  }

  /** Add the `pq_code` column (map-only codegen'd encode). */
  def encode(df: DataFrame, vecCol: String, cb: Codebook): DataFrame =
    df.withColumn("pq_code", pq_encode(col(vecCol), cb.flat, cb.m, cb.k, cb.subDim))

  /** ADC lookup table for a query: table[j*k+c] = q_subⱼ · centroidⱼ,c
    * (double, ascending element order — replayable). */
  def adcTable(queryVec: Array[Float], cb: Codebook): Array[Double] = {
    require(queryVec.length == cb.dim,
      s"query length ${queryVec.length} != codebook dim ${cb.dim}")
    val t = new Array[Double](cb.m * cb.k)
    var j = 0
    while (j < cb.m) {
      var c = 0
      while (c < cb.k) {
        var s = 0.0; var i = 0
        val off = (j * cb.k + c) * cb.subDim
        while (i < cb.subDim) {
          s += queryVec(j * cb.subDim + i).toDouble * cb.flat(off + i)
          i += 1
        }
        t(j * cb.k + c) = s
        c += 1
      }
      j += 1
    }
    t
  }

  /** Approximate top-k over a PRE-ENCODED corpus: per-row cost is `m`
    * table lookups; the scan never touches the float column. */
  def adcTopK(
      encoded: DataFrame,
      cb: Codebook,
      queryVec: Array[Float],
      k: Int,
      idCol: String): DataFrame = {
    require(k > 0, "k must be > 0")
    encoded
      .withColumn("qsim", pq_adc(col("pq_code"), adcTable(queryVec, cb), cb.m, cb.k))
      .orderBy(desc("qsim"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("qsim"))
  }

  /** PQ first pass + exact re-rank: ADC-scan for `rerankK` candidates,
    * then exact f64 scoring of only those rows (same pattern as
    * [[Quantize.quantizedTopKRerank]]). */
  def adcTopKRerank(
      encoded: DataFrame,
      vecCol: String,
      cb: Codebook,
      queryVec: Array[Float],
      k: Int,
      idCol: String,
      rerankK: Int): DataFrame = {
    require(rerankK >= k, "rerankK must be >= k")
    VectorSearch.exactRerank(encoded, vecCol, idCol,
      adcTopK(encoded, cb, queryVec, rerankK, idCol), queryVec, k)
  }
}
