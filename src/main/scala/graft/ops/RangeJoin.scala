package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/**
 * Binned range join — join point rows to interval rows of the same key
 * with `start <= point < end` (optionally inclusive end), without letting
 * Spark fall back to a broadcast-nested-loop / cartesian plan.
 *
 * Spark turns a bare inequality join condition into BroadcastNestedLoop
 * (or worse, CartesianProduct): every point row is tested against every
 * interval row — O(|P|·|I|) comparisons, a non-starter at 100 TB. The
 * standard fix (used by every interval-join engine: Flink, KDB, GeoSpark's
 * 1-D case) is to discretize the domain into fixed-width bins: an interval
 * covers ceil(len/w)+1 bins, a point lands in exactly one, and the join
 * becomes a plain shuffled EQUI-join on (key, bin) followed by the exact
 * residual predicate. Cost: O(|P| + |I|·bins/interval) shuffled rows —
 * linear, AQE-skew-splittable, and each matched pair is produced exactly
 * once (the point's bin is unique, so no post-join dedup is needed).
 *
 * Bin width is the operator's one tuning knob: ~the median interval
 * length keeps the blow-up factor ≤2 while keeping bins selective.
 * Intervals longer than `maxBinsPerInterval` bins fail LOUDLY (raise, not
 * silent truncation) — at that point the caller should pick a wider bin.
 */
object RangeJoin {

  /** Exact floor-division — the shared definition (see
    * [[graft.functions.ColumnMath.floorDiv]] for why `/` and DIV are
    * both wrong here). */
  private def floorDiv(c: Column, w: Long): Column =
    graft.functions.ColumnMath.floorDiv(c, w)

  /**
   * @param points     rows carrying a single position (`pointCol`, integral)
   * @param intervals  rows carrying `[startCol, endCol)` (integral)
   * @param key        equi-key column present on both sides (null keys
   *                   never match, as in a plain join)
   * @param binWidth   bin width in the position's units
   * @param endInclusive  true for closed intervals `[start, end]`
   * @param maxBinsPerInterval  loud upper bound on per-interval bin fan-out
   */
  def binnedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      endInclusive: Boolean = false,
      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be > 0")
    val dupCols = points.columns.toSet.intersect(intervals.columns.toSet) - key
    require(dupCols.isEmpty,
      s"column names must be disjoint apart from '$key': $dupCols")
    // a pre-existing __bin on ONE side would slip past the disjointness
    // check above and be silently overwritten + dropped — fail loudly
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not already carry a '__bin' column")

    val p = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val startBin = floorDiv(col(startCol), binWidth)
    val endBin = floorDiv(col(endCol), binWidth)
    // Reversed intervals (end < start) are EMPTY under the residual, so
    // they expand to zero bins (explode drops the row) — without the
    // explicit branch, sequence(start, stop) DESCENDS when stop < start
    // and a single corrupt row could fan out millions of bin rows,
    // bypassing the span guard (a negative span always compared < max).
    val span = endBin - startBin
    // null bounds FIRST: a null start/end makes span null, which is
    // not-true in BOTH guards below and would fall through to
    // raise_error — one dirty row killing the job (with a null message,
    // since concat nulls out), against the "null keys never match"
    // contract. Null-bounded intervals expand to zero bins instead.
    val i = intervals
      .withColumn("__bin", explode(
        when(span.isNull || span < 0L, array().cast("array<long>"))
          .when(span < lit(maxBinsPerInterval.toLong),
            sequence(startBin, endBin))
          .otherwise(raise_error(concat(
            lit(s"binnedRangeJoin: interval spans more than " +
              s"$maxBinsPerInterval bins of width $binWidth ("),
            span + lit(1L), lit(" bins) — widen binWidth"))))))

    val residual = if (endInclusive)
      col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)
    else
      col(pointCol) >= col(startCol) && col(pointCol) < col(endCol)

    p.join(i, Seq(key, "__bin")).filter(residual).drop("__bin")
  }
}
