package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splits for training pipelines.
 *
 * Random splits are unreproducible across engines and re-runs; the
 * portable answer is HASH bucketing: a document's split is a pure
 * function of its id (first 4 hex chars of md5, compared as strings
 * against cumulative-fraction thresholds). The same rule is expressible
 * in any engine with md5 — which is what makes an exact DuckDB oracle
 * possible — and at 100 TB it is a stateless map-only projection: no
 * sampling pass, no shuffle, stable under re-partitioning and re-runs.
 */
object Splits {

  /** Split-name column from cumulative md5-hex thresholds.
    * `fractions` must sum to 1 (±1e-9); order defines precedence. */
  def splitColumn(idCol: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val bucket = substring(md5(idCol.cast("string")), 1, 4)
    val thresholds = hexThresholds(fractions)
    // last split is the ELSE arm — no rounding gap can drop a row
    val whens = thresholds.init.map { case (name, hex) =>
      (name, bucket < lit(hex))
    }
    whens.foldRight(lit(thresholds.last._1): Column) {
      case ((name, cond), rest) => when(cond, lit(name)).otherwise(rest)
    }
  }

  /** Adds a `split` column. */
  def assign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), fractions))

  /** (name, upper-threshold-hex) per split, cumulative, 4 hex digits —
    * shared with the SQL oracle generator. */
  def hexThresholds(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    var cum = 0.0
    fractions.map { case (name, f) =>
      cum += f
      val t = math.min(65536L, math.round(cum * 65536.0))
      (name, f"$t%04x")
    }
  }
}
