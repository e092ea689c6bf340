package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorSumAggregate.vector_sum_long

/**
 * Distributed Lloyd k-means over an embedding column — corpus topic
 * bucketing, IVF coarse-quantizer training at full-data scale (vs the
 * bounded-sample driver training in [[IvfIndex]]), and embedding-space
 * stratification for split design.
 *
 * Exactness contract: float Lloyd is doubly nondeterministic (sum order
 * AND argmin ties). Here every step is integer arithmetic on
 * `e7 = round(e·scale)` elements:
 *   - distance² to a centroid is an exact Σ(e7−c7)² long,
 *   - assignment is argmin with ties broken toward the smallest cell id
 *     (array_position finds the FIRST minimum),
 *   - the centroid update truncates the exact per-cell mean back to
 *     integer units (Σe7 quot n, toward zero — matching SQL integer
 *     division), so the next round's input is bit-identical everywhere.
 * Result: assignments are reproducible under any partitioning and a SQL
 * engine can replay the whole fit.
 *
 * Scale shape: per round, ONE scan computing k distance expressions
 * in-codegen + ONE hash aggregate carrying k fixed-size long arrays
 * (map-side combined) to the driver — the same shuffle volume as a
 * count. Centroids ride the plan as literals (k·dim longs ≤ a few KB
 * for any sane k). Overflow: Σ(e7−c7)² ≤ dim·(2·scale)² must stay under
 * 2^63 — at scale=1e7 that allows dim ≤ ~23k.
 */
object KMeans {

  /** Fitted state: centroids in scaled-integer units, cell = array index. */
  final case class Model(centroids: Array[Array[Long]], scale: Long)

  /**
   * Run `iterations` Lloyd rounds from deterministic seeds: the k rows
   * with the smallest `idCol` values (one collect, k·dim longs).
   */
  def fit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iterations: Int,
      scale: Long = 10000000L): Model = {
    require(k >= 1 && iterations >= 0, "k >= 1, iterations >= 0")
    val vecs = df.filter(col(vecCol).isNotNull)
    // persist BEFORE the seed scan: seeding from the unpersisted frame
    // paid one full evaluation of the upstream lineage, then round 1
    // paid it again just to populate this cache — the seed top-k now
    // also populates it
    val cachedVecs =
      vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = cachedVecs.orderBy(col(idCol)).limit(k)
        .select(scaledLongs(col(vecCol), scale).as("e7"))
        .collect().map(_.getSeq[Long](0).toArray)
      require(init.length == k, s"need at least $k rows to seed $k cells")
      var centroids = init
      for (_ <- 1 to iterations) {
        val sums = assignCells(cachedVecs, vecCol, centroids, scale,
            Seq(scaledLongs(col(vecCol), scale).as("e7")))
          .groupBy("cell")
          .agg(vector_sum_long(col("e7")).as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => r.getLong(0).toInt ->
            ((r.getSeq[Long](1).toArray, r.getLong(2))))
          .toMap
        centroids = centroids.zipWithIndex.map { case (old, j) =>
          sums.get(j) match {
            case Some((s, n)) => s.map(_ / n) // quot, toward zero — SQL `//`
            case None => old                  // empty cell keeps its centroid
          }
        }
      }
      Model(centroids, scale)
    } finally cachedVecs.unpersist()
  }

  /** Assignment column: argmin cell id for each row of `df`. */
  def assign(df: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame =
    assignCells(df, vecCol, model.centroids, model.scale, Seq(col(idCol)))
      .select(col(idCol), col("cell"))

  /** Assignment keeping the scaled vector and its exact squared norm:
    * (idCol, cell, e7, n2) — the input shape of within-cell pair
    * operators ([[Dedup.semanticDedup]]) that need exact integer dots
    * without joining the vectors back. One scan, no extra exchange. */
  def assignScaled(df: DataFrame, vecCol: String, idCol: String,
      model: Model): DataFrame =
    assignCells(df, vecCol, model.centroids, model.scale,
      Seq(col(idCol), scaledLongs(col(vecCol), model.scale).as("e7")))
      .select(col(idCol), col("cell"), col("e7"),
        graft.functions.DenseVec.dense_dot(col("e7"), col("e7")).as("n2"))

  /** fit + assign in one call (the gate shape). */
  def fitAssign(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iterations: Int, scale: Long = 10000000L): DataFrame =
    assign(df, vecCol, idCol, fit(df, vecCol, idCol, k, iterations, scale))

  private def scaledLongs(vec: org.apache.spark.sql.Column, scale: Long) =
    graft.functions.ColumnMath.scaledLongs(vec, scale) // the ONE shared e7 definition

  /**
   * Exact integer argmin over literal centroids, first-min tie-break.
   * dist²_j = Σe7² − 2·y_j + Σc_j² with y = C·e7 computed by the ONE
   * codegen'd matmul kernel; Σe7² is row-constant, so
   * argmin_j (Σc_j² − 2·y_j) has identical order AND ties. Staged
   * projections keep the matmul evaluated exactly once per row.
   */
  private def assignCells(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Long]],
      scale: Long,
      carry: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val c2 = centroids.map(_.map(c => c * c).sum)
    df.filter(col(vecCol).isNotNull)
      .select(carry :+
        graft.functions.IntKernels.scaled_matmul(col(vecCol), centroids, scale)
          .as("__y"): _*)
      .select(col("*"),
        zip_with(typedlit(c2.toSeq), col("__y"), (a, y) => a - y * 2L).as("__d"))
      .select(col("*"),
        (array_position(col("__d"), array_min(col("__d"))) - 1)
          .cast("long").as("cell"))
      .drop("__y", "__d")
  }
}
