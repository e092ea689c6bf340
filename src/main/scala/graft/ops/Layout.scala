package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering — multi-dimensional data skipping for the
 * persisted corpus layout. Sorting by the interleaved key co-locates rows
 * close in BOTH dimensions, so parquet row-group min/max statistics prune
 * scans filtered on either column (the Delta/Iceberg OPTIMIZE ZORDER
 * technique, here as a plain column + range partitioner).
 *
 * The key is pure bit arithmetic (unrolled shifts/masks, whole-stage
 * codegen'd, map-only) and engine-portable: bit b of x lands at 2b, bit b
 * of y at 2b+1. Inputs are masked to `bits` low bits — callers map domain
 * values onto [0, 2^bits) first (bucketized floats, dictionary codes...).
 */
object Layout {

  /** Morton-interleave two non-negative integer columns (masked to
    * `bits` low bits each); bits ≤ 31 keeps the key in a positive long. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { b =>
      shiftleft(shiftright(xm, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(ym, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** N-column Morton key: bit b of column i lands at position b·n + i.
    * n·bits must stay ≤ 63 (e.g. 4 columns × 15 bits). */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "need at least one column")
    require(bits >= 1 && n * bits <= 63, s"$n columns × $bits bits must be <= 63")
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    (for (b <- 0 until bits; i <- 0 until n) yield
      shiftleft(shiftright(masked(i), b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_ + _)
  }

  /**
   * Range-partition + sort by the z-key: each output partition (= file on
   * write) covers a disjoint key range, so both x- and y-filtered scans
   * skip most files. One range-exchange — the price of any clustered
   * rewrite — then local sort only.
   */
  def clusterByZOrder(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numPartitions: Int,
      bits: Int = 16,
      keep: Boolean = false): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(col(xCol), col(yCol), bits))
    val out = keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
    if (keep) out else out.drop("__z")
  }
}
