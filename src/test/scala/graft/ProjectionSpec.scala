package graft

import org.apache.spark.sql.functions._

import graft.ops.Projection

class ProjectionSpec extends SparkSuite {
  import spark.implicits._

  test("sign matches the md5-parity definition and is ±1") {
    // md5("0_0") = d58f... → 'd' odd → -1; md5("3_7") = 702c... → '7' odd
    val m = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String) =
      String.format("%02x", Byte.box(m.digest(s.getBytes("UTF-8"))(0))).charAt(0)
    for (p <- 0 until 8; j <- 0 until 4) {
      val expected = if ("02468ace".contains(hex1(s"${p}_$j"))) 1L else -1L
      assert(Projection.sign(p, j) === expected, s"sign($p,$j)")
    }
  }

  test("randomProject computes exact integer ±1 projections") {
    val df = withLogLevel(Seq(
      (1L, Array(1e-7f, 2e-7f, 3e-7f)),
      (2L, null.asInstanceOf[Array[Float]])).toDF("id", "v"))
    val r = Projection.randomProject(df, "v", "id", 2, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val s = Projection.signMatrix(2, 3)
    assert(r((1L, 0L)) === s(0)(0) * 1 + s(0)(1) * 2 + s(0)(2) * 3)
    assert(r((1L, 1L)) === s(1)(0) * 1 + s(1)(1) * 2 + s(1)(2) * 3)
    assert(r.size === 2) // null vector skipped
  }

  test("scaled_matmul rejects non-float32 element types at analysis") {
    val df = withLogLevel(Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "v"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.IntKernels.scaled_matmul(
        col("v"), Array(Array(1L, 1L, 1L)), 10000000L)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("projection roughly preserves relative distances (JL sanity)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val df = withLogLevel(rows.toDF("id", "v"))
    val proj = Projection.randomProject(df, "v", "id", 16, 64)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toDouble) }
    // close pair in input stays relatively close in projection vs a far pair
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val base = rows.head._2.map(_.toDouble)
    val near = rows.head._2.map(x => x + 0.01 * rnd.nextGaussian().toFloat)
      .map(_.toDouble)
    // deterministic matrix: same projection applied on the driver
    val s = Projection.signMatrix(16, 64)
    def p(v: Array[Double]) = s.map(row =>
      row.zip(v).map { case (sg, x) => sg * math.round(x * 1e7).toDouble }.sum)
    assert(d(p(base), p(near)) < d(p(base), proj(25L).toArray))
  }
}
