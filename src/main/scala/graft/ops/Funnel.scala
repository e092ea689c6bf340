package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis — the product-analytics staple: of the users who
 * did step 1, how many went on to do step 2 AFTER it, then step 3 after
 * that, with first-match semantics (stage k's clock starts at the moment
 * stage k-1 was first reached).
 *
 * Scale shape: stage k is `events ⋈ reached_{k-1}` — an equi-join on user
 * against a frame that only SHRINKS as the funnel deepens, followed by a
 * per-user min. Each stage is one hash shuffle of the type-filtered slice
 * (the `event_type = step` predicate pushes into the scan, so each pass
 * reads only its step's rows); no window over the full event stream, no
 * per-user event-list materialization. All stage counts land in ONE job
 * via a union of the (already per-user) stage frames.
 */
object Funnel {

  /**
   * @param steps ordered event types forming the funnel (≥ 1)
   * @return (stage, step, n_users) — stage is the 0-based position;
   *         n_users is how many users reached it (monotone non-increasing)
   */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")

    // null timestamps out FIRST: a user whose stage-k events are all
    // null-ts would count as reaching stage k (count counts the row,
    // min(ts) = null) yet could never advance — `__ts > null` is never
    // true — inflating exactly one stage and breaking the advertised
    // monotone series' self-consistency
    val usable = events.filter(col(tsCol).isNotNull)
    // reached(k): one row per user with the time stage k was first reached
    val reached = steps.tail.scanLeft(
      usable.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
    ) { (prev, step) =>
      usable.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(prev, "__u")
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    }

    // one global count per stage (a row survives even when the stage
    // frame is EMPTY — a groupBy over the union dropped unreached
    // stages entirely, truncating the advertised per-stage monotone
    // series; the DuckDB oracle's count(*) per CTE always had the 0 row)
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }
}
