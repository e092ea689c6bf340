package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Johnson–Lindenstrauss random projection with a ±1 (Achlioptas) sign
 * matrix — embedding dimensionality reduction ahead of dedup/clustering
 * so downstream LSH/k-means scans touch k ≪ d values per row.
 *
 * Determinism contract: the sign matrix is not sampled — sign(j, p) is
 * the parity of the first hex digit of md5("p_j"). That makes the matrix
 * (a) identical on every run/driver/executor with no broadcast of random
 * state, and (b) replayable by any engine with md5 (the oracle recomputes
 * it in SQL). Projections are exact integers: proj_j = Σ_p sign·e7_p with
 * e7 = round(e·scale), so results are bit-stable under any partitioning.
 * |proj| ≤ dim·scale — at scale=1e7 safe for dim up to ~9·10^11.
 *
 * Scale shape: map-only — the sign matrix rides the plan as k literal
 * arrays (k·d longs), each output element is one codegen'd zip_with +
 * aggregate over the scan; no shuffle at all.
 */
object Projection {

  /** ±1 from the md5 parity of "p_j" — the shared Spark/SQL definition. */
  def sign(pos: Int, j: Int): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"${pos}_$j".getBytes(StandardCharsets.UTF_8))
    // first hex digit = high nibble of byte 0; even digit → +1
    if (((d(0) >> 4) & 1) == 0) 1L else -1L
  }

  def signMatrix(outDim: Int, inDim: Int): Array[Array[Long]] =
    Array.tabulate(outDim, inDim)((j, p) => sign(p, j))

  /**
   * Project `vecCol` (dim `inDim`) to `outDim` integer components,
   * exploded to (id, j, proj) rows. `proj` is in `scale` units of the
   * unnormalized ±1 projection (divide by scale·√outDim for the
   * JL-normalized float value — left to callers so the stored column
   * stays exact).
   */
  def randomProject(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      outDim: Int,
      inDim: Int,
      scale: Long = 10000000L): DataFrame = {
    require(outDim >= 1 && inDim >= 1, "dims must be >= 1")
    val signs = signMatrix(outDim, inDim)
    // one codegen'd pass: scale each element once, k integer dot rows
    // (raises on a vector whose length != inDim — silent truncation
    // would corrupt downstream distance comparisons)
    val projs = graft.functions.IntKernels.scaled_matmul(col(vecCol), signs, scale)
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), posexplode(projs).as(Seq("j", "proj")))
      .select(col(idCol), col("j").cast("long").as("j"), col("proj"))
  }
}
