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
      exact: Boolean = true,
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(rsd > 0, "rsd must be > 0")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")

    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"n__$c"),
        (count(lit(1)) - count(v)).as(s"null__$c"),
        (if (exact) countDistinct(v) else approx_count_distinct(v, rsd))
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

  /**
   * Top-k most frequent values per (categorical) column — the value-
   * distribution half of profiling (enum drift, junk-value detection).
   *
   * Scale shape: one unpivoted pass (`stack`) feeds a partial+final
   * count aggregate, so the corpus collapses to (column, value) counts
   * before anything ranks; the rank window runs over that counts table,
   * whose size is the summed value CARDINALITY of the profiled columns —
   * for categorical columns this is unrelated to corpus size. Ties break
   * (count DESC, value ASC), so the result is deterministic.
   */
  def topValues(
      df: DataFrame,
      cols: Seq[String],
      k: Int): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(k > 0, "k must be > 0")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val stacked = cols.map(c => s"'$c', cast(`$c` AS string)").mkString(", ")
    val counts = df
      .select(expr(s"stack(${cols.size}, $stacked) AS (column, value)"))
      .filter(col("value").isNotNull)
      .groupBy(col("column"), col("value")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column"))
      .orderBy(col("n").desc, col("value").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Per-group z-scores with EXACT moments — the anomaly-flagging staple
   * ("this event's value is 4σ off this user's norm"). Mean/variance come
   * from exact decimal sums of scaled integers, algebraically rearranged
   * so the whole score is one integer numerator over one integer-rooted
   * denominator: z = (n·v − Σv) / √(n·Σv² − (Σv)²) — bit-reproducible
   * and SQL-replayable; groups with zero variance (or one row) yield
   * null rather than ±∞.
   *
   * Scale shape: one stats aggregate (one row per group) plus one
   * equi-join of the input against it — a single data-sized shuffle,
   * keyed the way anomaly consumers group anyway.
   */
  def zscores(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      idCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale > 0, "scale must be > 0")
    val dec = "decimal(38,0)"
    val v = round(col(valueCol).cast("double") * scale).cast("long").cast(dec)
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(v).as("__s"), sum(v * v).as("__ss"))
    val num = (col("__n") * v - col("__s")).cast("double")
    val den = (col("__n") * col("__ss") - col("__s") * col("__s"))
      .cast("double")
    df.join(stats, groupCol)
      .select(col(idCol), col(groupCol),
        when(den > 0, num / sqrt(den)).as("z"))
  }

  /**
   * Exact-moment Pearson correlation for column pairs in one pass.
   *
   * A naive float `corr` is partition-order dependent (float sums do not
   * commute); here every moment (Σx, Σy, Σxy, Σx², Σy²) is an EXACT
   * decimal sum of scaled-integer values, so the moments are
   * bit-reproducible and SQL-replayable, and only the final closed-form
   * combination runs in floating point. Scale bounds: |x·scale| up to
   * ~1e16 squares into ~1e32 per row — decimal(38) holds corpus sums to
   * ~1e38, i.e. trillions of rows at money-cents magnitudes.
   */
  def corrExact(
      df: DataFrame,
      pairs: Seq[(String, String)],
      scale: Long = 100L): DataFrame = {
    require(pairs.nonEmpty, "pairs must be non-empty")
    require(scale > 0, "scale must be > 0")
    val missing = pairs.flatMap(p => Seq(p._1, p._2))
      .filterNot(df.columns.contains).distinct
    require(missing.isEmpty, s"columns not in frame: $missing")

    val dec = "decimal(38,0)"
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val xs = round(col(x).cast("double") * scale).cast("long").cast(dec)
      val ys = round(col(y).cast("double") * scale).cast("long").cast(dec)
      Seq(
        count(lit(1)).as(s"n__$i"),
        sum(xs).as(s"sx__$i"), sum(ys).as(s"sy__$i"),
        sum(xs * ys).as(s"sxy__$i"),
        sum(xs * xs).as(s"sxx__$i"), sum(ys * ys).as(s"syy__$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"'$x', '$y', `n__$i`, `sx__$i`, `sy__$i`, `sxy__$i`, `sxx__$i`, `syy__$i`"
    }.mkString(", ")
    one.select(expr(
        s"stack(${pairs.size}, $stacked) AS (x_col, y_col, n, sx, sy, sxy, sxx, syy)"))
      .withColumn("corr",
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")) /
        sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")) *
          (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))))
      // Deterministic cross-engine handle: `round(corr, 6)` diverges
      // between engines (JVM BigDecimal-of-Double.toString vs native
      // dtoa half-way rules), but the double `corr` itself is
      // bit-identical wherever casts, *, -, / and sqrt are IEEE-754
      // correctly rounded and operators are evaluated un-fused — so
      // floor(corr * 1e6) as an integer never touches a decimal
      // formatting path and compares exactly across engines.
      .withColumn("corr_e6", floor(col("corr") * lit(1e6)).cast("long"))
  }
}
