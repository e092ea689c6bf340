package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zorderKey interleaves bits (x at even positions, y at odd)") {
    val df = withLogLevel(Seq(
      (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L), (65535L, 65535L)
    ).toDF("x", "y"))
    val r = df.select(col("x"), col("y"),
        Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r((1L, 0L)) === 1L)          // x bit 0 → position 0
    assert(r((0L, 1L)) === 2L)          // y bit 0 → position 1
    assert(r((3L, 3L)) === 15L)         // 0b1111
    assert(r((2L, 1L)) === 6L)          // x bit1→pos2 (4) + y bit0→pos1 (2)
    assert(r((65535L, 65535L)) === (1L << 32) - 1) // all 32 low bits set
  }

  test("inputs are masked to the bit width (no negative/overflow keys)") {
    val df = withLogLevel(Seq((65536L + 5L, -1L)).toDF("x", "y"))
    val z = df.select(Layout.zorderKey(col("x"), col("y")).as("z"))
      .head().getLong(0)
    // x masks to 5, y masks to 65535 — key stays in [0, 2^32)
    val expected = df.sparkSession.range(1)
      .select(Layout.zorderKey(lit(5L), lit(65535L)).as("z")).head().getLong(0)
    assert(z === expected && z >= 0L && z < (1L << 32))
  }

  test("zorderKeyN generalizes: 2-col agrees with zorderKey, 3-col interleaves") {
    val df = withLogLevel(Seq((5L, 9L, 3L)).toDF("x", "y", "w"))
    val both = df.select(
      Layout.zorderKey(col("x"), col("y")).as("a"),
      Layout.zorderKeyN(Seq(col("x"), col("y")), 16).as("b")).head()
    assert(both.getLong(0) === both.getLong(1))
    // 3 columns, 1 bit each: key = x&1 + 2*(y&1) + 4*(w&1)
    val k3 = df.select(Layout.zorderKeyN(
      Seq(col("x"), col("y"), col("w")), 1).as("k")).head().getLong(0)
    assert(k3 === (1L + 2L + 4L))
  }

  test("clusterByZOrder yields disjoint per-partition key ranges") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = withLogLevel(rows.toDF("x", "y"))
    val parts = Layout.clusterByZOrder(df, "x", "y", 8, keep = true)
      .select(spark_partition_id().as("p"), col("__z"))
      .groupBy("p").agg(min("__z").as("lo"), max("__z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    parts.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
    // and both dimensions are locally bounded: a z-range bounds x and y
    assert(parts.length > 1)
  }
}
