package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Conditional scan-spread for unsplittable inputs (optimization guide
 * §2.5, "input skew: one huge unsplittable file … repartition
 * immediately after the read").
 *
 * A parquet ROW GROUP is the unit of scan parallelism: a table written
 * as one file with one row group decodes on ONE task no matter how many
 * cores the session has, and every operator up to the first Exchange
 * (projection kernels, partial aggregation) inherits that single
 * thread. `adaptive` inserts a round-robin repartition to the session's
 * default parallelism — but ONLY when the plan's scan parallelism is
 * actually below it, so the rewrite is scale-adaptive, not a local[32]
 * constant:
 *
 *  - at 100 TB the same table is thousands of splits — `parts >= par`,
 *    the condition is false, and the plan is UNCHANGED (no shuffle is
 *    added to a frame that is already parallel; callers pinned on
 *    "text never shuffles"-style properties keep them where they
 *    matter);
 *  - a small-relative-to-the-cluster input pays one tiny exchange
 *    (bounded by the input size, by definition of the condition) and
 *    gets a fully parallel map stage in return.
 *
 * The row placement after a keyless repartition is deterministic for a
 * deterministic input (`spark.sql.execution.sortBeforeRepartition`, on
 * by default) and every operator downstream of a spread is
 * layout-invariant by the census's partitioning-invariance contract,
 * so results are bit-identical with and without the spread.
 *
 * The partition-count probe (`df.rdd.getNumPartitions`) plans the
 * frame but runs no job — sub-ms at gate scale, and callers apply the
 * spread once per query construction.
 */
object Spread {

  /** `df` repartitioned to the session's default parallelism iff its
    * current plan has fewer partitions than that; `df` unchanged
    * otherwise. */
  def adaptive(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
