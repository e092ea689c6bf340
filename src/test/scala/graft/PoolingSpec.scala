package graft

import org.apache.spark.sql.functions._

import graft.ops.Pooling

class PoolingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = withLogLevel(Seq(
    ("a", Array(1.0f, 2.0f, 3.0f)),
    ("a", Array(3.0f, 2.0f, 1.0f)),
    ("a", Array(2.0f, 2.0f, 2.0f)),
    ("b", Array(-1.0f, 0.5f, 0.25f)),
    ("b", null.asInstanceOf[Array[Float]])   // null vectors are skipped
  ).toDF("g", "v"))

  test("centroids compute the exact per-group element-wise mean") {
    val r = Pooling.centroids(vecs, "v", "g")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
      .toSet
    assert(r === Set(
      ("a", 0L, 2.0), ("a", 1L, 2.0), ("a", 2L, 2.0),
      ("b", 0L, -1.0), ("b", 1L, 0.5), ("b", 2L, 0.25)))
  }

  test("centroidVectors keeps one array row per group with counts") {
    val r = Pooling.centroidVectors(vecs, "v", "g").collect()
      .map(x => x.getString(0) -> ((x.getSeq[Double](1).toSeq, x.getLong(2))))
      .toMap
    assert(r("a") === ((Seq(2.0, 2.0, 2.0), 3L)))
    assert(r("b") === ((Seq(-1.0, 0.5, 0.25), 1L)))
  }

  test("outlierScores: exact distance to own-group centroid flags the odd one") {
    import spark.implicits._
    val df = withLogLevel(Seq(
      (1L, "a", Array(1.0f, 0.0f)),
      (2L, "a", Array(1.0f, 0.0f)),
      (3L, "a", Array(1.0f, 0.0f)),
      (4L, "a", Array(0.0f, 1.0f)),   // the mislabeled point
      (5L, "b", Array(0.5f, 0.5f)),
      (6L, "b", null.asInstanceOf[Array[Float]])
    ).toDF("id", "g", "v"))
    val r = Pooling.outlierScores(df, "v", "g", "id")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // centroid of a = (0.75, 0.25); d(1,0) = sqrt(0.125), d(0,1) = sqrt(1.125)
    assert(math.abs(r(1L) - math.sqrt(0.125)) < 1e-9, r.toString)
    assert(math.abs(r(4L) - math.sqrt(1.125)) < 1e-9, r.toString)
    assert(r(4L) > r(1L) * 2.9, "outlier must dominate")
    assert(r(5L) === 0.0, "singleton group sits on its own centroid")
    assert(!r.contains(6L), "null vectors are excluded")
    // deterministic under re-partitioning (integer numerator)
    val again = Pooling.outlierScores(df.repartition(5), "v", "g", "id")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(again === r)
  }

  test("outlierScores broadcasts the centroid stats — map-side distance") {
    import spark.implicits._
    val df = Seq((1L, "a", Array(1.0f, 0.0f))).toDF("id", "g", "v")
    val p = Pooling.outlierScores(df, "v", "g", "id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"stats must broadcast back, not shuffle the vectors:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dimension mismatch raises instead of silently zero-padding") {
    val bad = Seq(("a", Array(1.0f)), ("a", Array(1.0f, 2.0f))).toDF("g", "v")
    val e = intercept[Exception] {
      Pooling.centroids(bad, "v", "g").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimension mismatch")))
  }

  test("aggregation is partial+final (map-side combine before the exchange)") {
    val df = Pooling.centroidVectors(vecs, "v", "g")
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected a single group exchange:\n$p")
  }

  test("result is identical across partitionings (exact integer sums)") {
    val big = (1 to 500).map(i =>
      (s"g${i % 7}", Array.fill(16)((math.sin(i * 0.37) * 0.1).toFloat)))
      .toDF("g", "v")
    val one = Pooling.centroids(big.coalesce(1), "v", "g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val many = Pooling.centroids(big.repartition(13), "v", "g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one === many)
  }
}
