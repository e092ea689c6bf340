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
