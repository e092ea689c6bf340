package graft

import org.apache.spark.sql.functions._

import graft.functions.Int128Sum

class Int128SumSpec extends SparkSuite {
  import spark.implicits._

  test("sum128 ≡ decimal sum on randomized signed longs, any partitioning") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(rnd.nextLong() / 1000)
    val df = xs.toDF("x")
    val want = df.agg(sum(col("x").cast("decimal(38,0)"))).head().getDecimal(0)
    val got = df.agg(Int128Sum.sum128(col("x"))).head().getDecimal(0)
    assert(got.compareTo(want) === 0)
    val again = df.repartition(13).agg(Int128Sum.sum128(col("x")))
      .head().getDecimal(0)
    assert(again.compareTo(want) === 0)
  }

  test("sumProduct128 is exact where 64-bit products would wrap") {
    // ±1e15-scale values square to ~1e30 per row — far past Long range;
    // the decimal reference computes the same product via decimal×decimal
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextLong() % (1L << 50)), (rnd.nextLong() % (1L << 50)))
    val df = rows.toDF("x", "y")
    val want = df.agg(
        sum(col("x").cast("decimal(38,0)") * col("y").cast("decimal(38,0)")))
      .head().getDecimal(0)
    val got = df.agg(Int128Sum.sumProduct128(col("x"), col("y")))
      .head().getDecimal(0)
    assert(got.compareTo(want) === 0)
    val again = df.repartition(17)
      .agg(Int128Sum.sumProduct128(col("x"), col("y"))).head().getDecimal(0)
    assert(again.compareTo(want) === 0)
  }

  test("SQL null semantics: empty and all-null groups yield null, null rows skip") {
    val df = Seq[(Option[Long], Option[Long])](
      (Some(3L), None), (None, Some(4L)), (Some(5L), Some(6L)))
      .toDF("x", "y")
    val r = df.agg(
      Int128Sum.sum128(col("x")).as("sx"),
      Int128Sum.sumProduct128(col("x"), col("y")).as("sxy")).head()
    assert(r.getDecimal(0).longValueExact === 8L)  // 3 + 5
    assert(r.getDecimal(1).longValueExact === 30L) // only (5, 6) contributes
    val empty = df.filter(lit(false)).agg(
      Int128Sum.sum128(col("x")), Int128Sum.sumProduct128(col("x"), col("y"))).head()
    assert(empty.isNullAt(0) && empty.isNullAt(1))
    val allNull = Seq[Option[Long]](None, None).toDF("x")
      .agg(Int128Sum.sum128(col("x"))).head()
    assert(allNull.isNullAt(0))
  }

  test("corrExact moments via 128-bit aggregates match the decimal-sum reference") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(3000)((rnd.nextDouble() * 1e4, rnd.nextDouble() * 1e4))
      .toDF("a", "b")
    val m = graft.ops.Profile.corrExact(df, Seq(("a", "b"))).head()
    val dec = "decimal(38,0)"
    val xs = round(col("a").cast("double") * 100).cast("long").cast(dec)
    val ys = round(col("b").cast("double") * 100).cast("long").cast(dec)
    val want = df.agg(sum(xs), sum(ys), sum(xs * ys), sum(xs * xs), sum(ys * ys)).head()
    assert(m.getAs[java.math.BigDecimal]("sx").compareTo(want.getDecimal(0)) === 0)
    assert(m.getAs[java.math.BigDecimal]("sy").compareTo(want.getDecimal(1)) === 0)
    assert(m.getAs[java.math.BigDecimal]("sxy").compareTo(want.getDecimal(2)) === 0)
    assert(m.getAs[java.math.BigDecimal]("sxx").compareTo(want.getDecimal(3)) === 0)
    assert(m.getAs[java.math.BigDecimal]("syy").compareTo(want.getDecimal(4)) === 0)
  }
}
