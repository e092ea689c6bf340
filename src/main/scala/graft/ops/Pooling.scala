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

  /**
   * Distance of every vector to its own group's centroid — the
   * "mislabeled / out-of-distribution sample" signal (high distance =
   * the embedding disagrees with its label; standard training-data
   * triage before fine-tuning on labeled sets).
   *
   * Exactness: works entirely in scaled-integer space. With e7 =
   * round(e·scale), S_p = Σ e7 over the group at position p and n the
   * group size, the squared distance is Σ_p (e7·n − S_p)² / (scale·n)²
   * — the numerator is an EXACT integer (decimal(38) guards the squares
   * against long overflow), so the score is order-independent and
   * bit-reproducible, and a SQL engine can replay it exactly.
   *
   * Scale shape: one tiny aggregate (groups × dim longs) broadcasts
   * back; the distance itself is a map-side zip_with over the scan — no
   * data-sized shuffle at all, so the cost at 100 TB is one pass.
   */
  def outlierScores(
      df: DataFrame,
      vecCol: String,
      groupCol: String,
      idCol: String,
      scale: Long = 10000000L): DataFrame = {
    require(scale > 0, "scale must be > 0")
    val stats = df.filter(col(vecCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(vector_sum_long(scaledLongs(col(vecCol), scale)).as("__sum"),
        count(lit(1)).as("__n"))
    val diffSq = zip_with(
      scaledLongs(col(vecCol), scale), col("__sum"),
      (e7, s) => {
        // widen to decimal BEFORE the multiply: e7·n in LONG wraps
        // silently past 2^63 (n ≈ 1e10 rows at e7 ≈ 1e9), which the
        // "exact integer numerator" contract must not do — only the
        // squares were decimal-guarded before
        val d = e7.cast("decimal(38,0)") * col("__n") - s.cast("decimal(38,0)")
        d * d
      })
    df.filter(col(vecCol).isNotNull)
      .join(broadcast(stats), groupCol)
      .select(col(idCol), col(groupCol),
        aggregate(diffSq, lit(0).cast("decimal(38,0)"), (acc, x) => acc + x)
          .as("__num"), col("__n"))
      .select(col(idCol), col(groupCol),
        (sqrt(col("__num").cast("double")) /
          (lit(scale).cast("double") * col("__n"))).as("dist"))
  }

  private def scaledLongs(vec: Column, scale: Long): Column =
    graft.functions.ColumnMath.scaledLongs(vec, scale) // the ONE shared e7 definition
}
