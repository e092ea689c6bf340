package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fuzzy (edit-distance) dimension join — the entity-resolution staple:
 * match free-text values against a canonical dimension ("US", "USA",
 * "U.S.A." → one country row), keeping each row's BEST match (smallest
 * Levenshtein distance, ties to the lexicographically first candidate —
 * fully deterministic).
 *
 * Scale shape: the canonical side broadcasts (dimensions are small — the
 * whole point of canonicalization), the distance filter runs map-side
 * against the broadcast, and the per-row argmin is a `min_by` aggregate
 * over a unique (dist, candidate) ordering struct — partial+final with
 * map-side combine, no window, no shuffle of the candidate fan-out. The
 * corpus shuffles once, already reduced to one row per input row.
 * For large×large fuzzy self-joins use the LSH dedup family instead
 * (`Dedup.minhashDuplicates` at character-shingle granularity).
 */
object FuzzyJoin {

  /**
   * @param left      rows to resolve
   * @param right     canonical values, one per row (must be distinct)
   * @param leftCol   dirty column on `left`
   * @param rightCol  canonical column on `right`
   * @param maxDist   maximum Levenshtein distance to accept
   * @return `left` columns + `match` (best canonical value) + `dist`;
   *         rows with no candidate within `maxDist` are dropped. The
   *         rollup groups by ALL left columns — include a unique id on
   *         `left` (any real pipeline has one) or fully-identical rows
   *         collapse.
   */
  def bestMatch(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(!left.columns.contains("match") && !left.columns.contains("dist"),
      "left side must not already have match/dist columns")
    val cand = left.join(
        broadcast(right.select(col(rightCol).as("__cand")).distinct()),
        levenshtein(col(leftCol), col("__cand")) <= maxDist)
      .withColumn("__d", levenshtein(col(leftCol), col("__cand")))
    cand.groupBy(left.columns.map(col).toIndexedSeq: _*)
      .agg(min_by(col("__cand"), struct(col("__d"), col("__cand"))).as("match"),
        min(col("__d")).as("dist"))
  }
}
