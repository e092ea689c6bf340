package graft

import org.apache.spark.sql.functions._

import graft.ops.KMeans

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  // two tight groups around (1,0) and (0,1); ids 0 and 3 seed the cells
  private lazy val vecs = withLogLevel(Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.95f, 0.05f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(0.1f, 0.9f)),
    (5L, null.asInstanceOf[Array[Float]])
  ).toDF("id", "v"))

  test("fitAssign separates two obvious clusters from id-ordered seeds") {
    // k=2 seeds = ids 0 and 1 (both group A); after an update round the
    // second centroid still sits in group A, so use k=2, iterations=2 on
    // a frame where the seeds span the groups: reorder via id mapping
    val df = vecs.filter(col("id") =!= 1L && col("id") =!= 2L)
    val r = KMeans.fitAssign(df, "v", "id", 2, 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) === 0L && r(3L) === 1L && r(4L) === 1L)
    assert(!r.contains(5L)) // null vectors skipped
  }

  test("assignment is integer-exact and deterministic under repartition") {
    val a = KMeans.fitAssign(vecs, "v", "id", 2, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = KMeans.fitAssign(vecs.repartition(5), "v", "id", 2, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a === b)
    // group A (ids 0,1,2) and group B (ids 3,4) land in different cells
    val m = a.toMap
    assert(m(0L) === m(1L) && m(1L) === m(2L))
    assert(m(3L) === m(4L) && m(0L) != m(3L))
  }

  test("argmin ties break toward the smallest cell id") {
    // both centroids identical after seeding from duplicate rows
    val dup = withLogLevel(Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.5f, 0.5f))).toDF("id", "v"))
    val r = KMeans.assign(dup, "v", "id",
        KMeans.fit(dup, "v", "id", 2, 0))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) === 0L && r(1L) === 0L && r(2L) === 0L)
  }

  test("centroid update truncates toward zero like SQL integer division") {
    // mean of e7 values {10, 15} = 12.5 → 12; {-10, -15} → -12 (not -13)
    val df = withLogLevel(Seq(
      (0L, Array(10e-7f)), (1L, Array(15e-7f))).toDF("id", "v"))
    val m = KMeans.fit(df, "v", "id", 1, 1)
    assert(m.centroids(0)(0) === 12L)
    val neg = withLogLevel(Seq(
      (0L, Array(-10e-7f)), (1L, Array(-15e-7f))).toDF("id", "v"))
    assert(KMeans.fit(neg, "v", "id", 1, 1).centroids(0)(0) === -12L)
  }
}
