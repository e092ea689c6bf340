package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorSumAggregate.vector_sum_long

/**
 * Embedding pooling — element-wise mean of an embedding column per group
 * (class prototypes, cluster centroids, user/document profile vectors).
 *
 * Determinism contract: float summation is order-dependent, so a naive
 * float mean can hash-differently run to run under Spark's nondeterministic
 * partial-aggregation order. Instead each element is scaled to a long
 * (`round(e * scale)`) in-scan, summed EXACTLY by the `vector_sum_long`
 * aggregate (map-side combine, one fixed-size array per group on the
 * exchange), and divided back once at the end. With scale=1e7 the
 * quantization error (5e-8 per element) is far below float32 input
 * precision, and the result is bit-stable under any partitioning — the
 * property the correctness gate (and any incremental 100 TB pipeline
 * diffing successive runs) needs.
 */
object Pooling {

  /** Per-group mean vector, exploded to (group, pos, c) rows. */
  def centroids(
      df: DataFrame,
      vecCol: String,
      groupCol: String,
      scale: Long = 10000000L): DataFrame = {
    require(scale > 0, "scale must be > 0")
    df.filter(col(vecCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(vector_sum_long(scaledLongs(col(vecCol), scale)).as("__sum"),
        count(lit(1)).as("__n"))
      .select(col(groupCol), posexplode(col("__sum")).as(Seq("pos", "__s")),
        col("__n"))
      .select(col(groupCol), col("pos").cast("long").as("pos"),
        (col("__s") / (lit(scale) * col("__n"))).as("c"))
  }

  /** Per-group mean vector kept as one array<double> row per group —
    * the shape downstream similarity ops consume (e.g. prototype kNN). */
  def centroidVectors(
      df: DataFrame,
      vecCol: String,
      groupCol: String,
      scale: Long = 10000000L): DataFrame = {
    require(scale > 0, "scale must be > 0")
    df.filter(col(vecCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(vector_sum_long(scaledLongs(col(vecCol), scale)).as("__sum"),
        count(lit(1)).as("__n"))
      .select(col(groupCol),
        transform(col("__sum"),
          s => s / (lit(scale) * col("__n"))).as("centroid"),
        col("__n").as("n"))
  }

  private def scaledLongs(vec: Column, scale: Long): Column =
    transform(vec, e => round(e.cast("double") * scale).cast("long"))
}
