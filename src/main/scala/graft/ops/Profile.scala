package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dataset profiling — per-column summary statistics in ONE scan, the
 * "know your corpus before you train on it" primitive (null rates,
 * cardinalities, ranges drive schema checks and drift alerts between
 * pipeline runs).
 *
 * Scale shape: a single global aggregation computes every metric for
 * every column in one pass (partial+final, no per-column jobs), then the
 * one result row unpivots driver-free via `stack`. Exact distinct counts
 * make Catalyst EXPAND the input ×|cols| before the partial aggregate —
 * fine for a handful of profiled columns, but at 100 TB × many columns
 * pass `exact = false` to use HyperLogLog sketches (approx_count_distinct,
 * no expand, one pass, ~2% error).
 */
object Profile {

  /** One output row per profiled numeric column:
    * (column, n, n_null, n_distinct, mn, mx). */
  def numericProfile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")

    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"n__$c"),
        (count(lit(1)) - count(v)).as(s"null__$c"),
        (if (exact) countDistinct(v) else approx_count_distinct(v))
          .as(s"dist__$c"),
        min(v).cast("double").as(s"mn__$c"),
        max(v).cast("double").as(s"mx__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the single row: stack(n, 'col1', n__col1, ..., 'colk', ...)
    val stacked = cols.map { c =>
      s"'$c', `n__$c`, `null__$c`, `dist__$c`, `mn__$c`, `mx__$c`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS (column, n, n_null, n_distinct, mn, mx)"))
  }

  /**
   * Exact interpolated quantiles for every column in ONE aggregation pass
   * (linear interpolation at rank q·(n−1), the quantile_cont convention).
   *
   * Values are scaled to integers (`round(col·scale)`) before ranking, so
   * the interpolation arithmetic is exact in double (integer endpoints ×
   * exactly-representable quartile fractions) — bit-reproducible and
   * SQL-replayable. Exact percentiles keep per-value counts as aggregate
   * state: bounded-domain columns (money cents, counts, enum codes) stay
   * small at any corpus size; for unbounded high-cardinality doubles at
   * 100 TB use `exact = false` (t-digest sketch, no value map).
   */
  def quantileProfile(
      df: DataFrame,
      cols: Seq[String],
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      scale: Long = 1L,
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    require(scale > 0, "scale must be > 0")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")

    val fn = if (exact) "percentile" else "percentile_approx"
    val qArr = qs.mkString("array(", ", ", ")")
    val aggs = cols.map { c =>
      expr(s"$fn(round(`$c` * $scale), $qArr)").as(s"p__$c")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.flatMap { c =>
      qs.zipWithIndex.map { case (q, i) =>
        s"'$c', ${q}D, `p__$c`[$i] / ${scale}D"
      }
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size * qs.size}, $stacked) AS (column, q, v)"))
  }

  /**
   * Fixed-width histogram — (bin, lo, n) where bin = value DIV width in
   * scaled-integer space (exact binning, no float-edge ambiguity about
   * which side of a boundary a value lands on). One groupBy whose key
   * count is the number of OCCUPIED bins — bounded by the value range,
   * not the corpus — so the exchange stays tiny at any scale.
   */
  def histogram(
      df: DataFrame,
      c: String,
      binWidth: Double,
      scale: Long = 100L): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    require(scale > 0, "scale must be > 0")
    val widthScaled = math.round(binWidth * scale)
    require(widthScaled > 0, "binWidth must not round to zero at this scale")
    val v = round(col(c).cast("double") * scale).cast("long")
    df.filter(col(c).isNotNull)
      .groupBy(floorDiv(v, widthScaled).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("bin") * widthScaled / lit(scale.toDouble)).as("lo"), col("n"))
  }

  // floor division for possibly-negative longs (Spark's `div` truncates
  // toward zero; histogram bins must floor so -1 cents lands in bin -1).
  // (a - pmod(a,b)) is exactly divisible by b and pmod is non-negative,
  // so the double division is an exact integer.
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")
}
