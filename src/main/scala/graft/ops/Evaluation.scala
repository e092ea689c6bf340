package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Quality metrics for approximate operators — how good is the sketch /
 * index against exact ground truth. Used to tune LSH planes, IVF nprobe,
 * and MinHash banding before paying for a 100 TB run.
 */
object Evaluation {

  /** recall@k of an approximate id set vs the exact top-k (driver-side,
    * for single-query evaluation). */
  def recallAtK[K](exact: Seq[K], approx: Seq[K]): Double =
    if (exact.isEmpty) 1.0
    else exact.toSet.intersect(approx.toSet).size.toDouble / exact.size

  /** Pair-level precision/recall of candidate pairs vs ground-truth pairs
    * (for dedup sketches). Both DataFrames need (id_a, id_b) columns. */
  def pairMetrics(truth: DataFrame, candidates: DataFrame): (Double, Double) = {
    val t = truth.select("id_a", "id_b").distinct()
    val c = candidates.select("id_a", "id_b").distinct()
    val tp = c.join(t, Seq("id_a", "id_b"), "left_semi").count().toDouble
    val nT = t.count().toDouble
    val nC = c.count().toDouble
    val precision = if (nC == 0) 1.0 else tp / nC
    val recall = if (nT == 0) 1.0 else tp / nT
    (precision, recall)
  }

  /** Mean recall@k of an ANN method over a batch of query rows, against
    * brute-force ground truth via knnJoin. `exact`/`approx` both carry
    * (query_id, vec_id) rows ranked within each query_id. */
  def meanRecallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val totals = exact.groupBy("query_id").agg(count(lit(1)).as("total"))
    val per = totals.join(hits, Seq("query_id"), "left")
      .select((coalesce(col("hits"), lit(0L)).cast("double") / col("total")).as("r"))
    per.agg(avg(col("r"))).head().getDouble(0)
  }
}
