package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LM training — the concat-and-chunk step that turns
 * a document corpus into fixed-token-budget training sequences: documents
 * are laid end to end in a deterministic order and every document learns
 * which pack(s) its tokens land in (`pack_first`..`pack_last`; a document
 * may straddle a pack boundary, exactly like production concat-and-chunk
 * pipelines).
 *
 * Determinism: the layout is a pure function of the data — documents are
 * sharded by an md5-derived bucket of their id and ordered by id within
 * the shard, so offsets are reproducible across engines, re-runs, and
 * partitionings (and SQL-replayable: the whole op is one window
 * cumulative sum).
 *
 * Scale shape: one shuffle by shard + an in-partition sort — the minimum
 * for a deterministic global layout. `shards` is the parallelism knob:
 * each shard packs independently (a real pipeline writes one output file
 * stream per shard), so 100 TB packs as thousands of independent sorted
 * partitions rather than one global order-by.
 */
object Packing {

  /**
   * @return (id, shard, n_tokens, start_offset, pack_first, pack_last)
   *         where start_offset is the document's first-token position in
   *         its shard's concatenated token stream and packs are
   *         `budgetTokens`-sized windows of that stream.
   */
  def contiguousOffsets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Int,
      shards: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be > 0")
    // the shard key is 16 bits of md5, so shards beyond 65536 would be
    // silently EMPTY (pmod of a 16-bit value can't reach them) — and
    // divisors of 65536 balance exactly; others skew by ≤ 1/65536·shards
    require(shards > 0 && shards <= 65536,
      "shards must be in [1, 65536] (the shard key is 16 bits of md5)")
    // NOTE: offsets are a pure function of the data only when idCol is
    // UNIQUE — the rows-frame cumulative sum resolves duplicate-id ties
    // in partition-arrival order (callers dedup first; every gate corpus
    // has unique ids by construction)
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), shard.as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer `div`, not `/`: double division would round past 2^53
      // when shard token streams grow to trillions of tokens
      .withColumn("pack_first", expr(s"start_offset div $budgetTokens"))
      .withColumn("pack_last",
        expr(s"(start_offset + n_tokens - 1) div $budgetTokens"))
  }
}
