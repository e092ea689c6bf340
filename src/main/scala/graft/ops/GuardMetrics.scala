package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Loud-drop plumbing for [[Dedup.guardBuckets]] (r16): the guard's
 * oversized-bucket aggregate runs inside the main action (an
 * `observe()` metric on the broadcast build side), and this listener
 * turns every observed non-empty drop into the same WARN the old
 * separate stats job logged synchronously — the safety property the
 * r13/r14 audits pinned ("caps are never silent"), now evaluated
 * without a dedicated job per guard.
 *
 * Registration is idempotent per session (weak keys — a stopped test
 * session must not pin the map). The listener bus delivers onSuccess
 * asynchronously, so the WARN trails the action by bus latency; specs
 * poll [[lastDrop]] rather than the log.
 */
private[graft] object GuardMetrics {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Observe-metric name prefix; the suffix is the guarded op's name. */
  val Prefix = "graft_dedup_guard_"

  /** Test hook: the most recent observed drop (op, nBuckets, nRows),
    * set only when nBuckets > 0 — the same condition that WARNs. */
  @volatile private[graft] var lastDrop: Option[(String, Long, Long)] = None
  /** Test hook: total guard metrics SEEN (drop or not) — proves the
    * CollectMetrics node survives broadcast builds and AQE. */
  private[graft] val seen = new java.util.concurrent.atomic.AtomicLong

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    val first = registered.synchronized {
      registered.put(spark, java.lang.Boolean.TRUE) == null
    }
    if (!first) return
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(Prefix)) {
            seen.incrementAndGet()
            val op = name.stripPrefix(Prefix)
            val nb = row.getLong(0)
            val nr = row.getLong(1)
            val cap = row.getLong(2)
            if (nb > 0) {
              lastDrop = Some((op, nb, nr))
              log.warn(s"$op: dropping $nb oversized LSH bucket(s) " +
                s"(> $cap rows each, $nr banded rows skipped). " +
                "Near-dups inside dropped buckets are NOT paired here — " +
                "run exact dedup first (identical docs fill every bucket) " +
                "or raise maxBucketSize.")
            }
          }
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
  }
}
