package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet staging for correctness-gate intermediates.
 *
 * Some gate queries start from data no SQL oracle can derive (image /
 * PCM / AVI decode). Their DOWNSTREAM algebra (banded-Hamming candidate
 * joins, popcount verify, shared-keyframe joins) is perfectly
 * SQL-expressible, so the gate stages the decode OUTPUT — exact int64
 * fingerprints — as a parquet intermediate at a fixed path, recomputes
 * the pairing from the staged frame, and the DuckDB oracle replays the
 * pairing from the SAME staged bytes. Decode itself stays spec-tested
 * against real fixtures (MultimodalSpec); the stage turns the pairing
 * half of those entries from rows-only into hash-gated.
 *
 * The path lives under the build's target/ dir (absolute, because the
 * oracle runs as a separate DuckDB process with its own cwd) and is
 * overwritten per run, so the oracle always sees the bytes of the
 * Verify pass that just ran.
 */
object GateStage {

  /** Absolute staging root — referenced verbatim by oracle SQL. */
  val Root = "/root/repo/target/gate_stage"

  /** Write `df` to the named stage (overwrite) and read it back, so the
    * caller's downstream plan consumes exactly the staged bytes. */
  def stage(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
    val path = s"$Root/$name"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** The glob the DuckDB oracle uses to read a stage. */
  def oracleGlob(name: String): String = s"$Root/$name/*.parquet"
}
