package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.KmvDistinct

class KmvDistinctSpec extends SparkSuite {
  import spark.implicits._

  private def agg(k: Int) =
    KmvDistinct(BoundReference(0, LongType, nullable = true), k)

  // drive the aggregate directly (no Spark plan): sequential updates
  private def runSeq(a: KmvDistinct, xs: Seq[Long]) = {
    val buf = a.createAggregationBuffer()
    xs.foreach(x => a.update(buf, InternalRow(x)))
    buf
  }

  test("merge of arbitrary splits ≡ sequential insert (fuzzed)") {
    val rnd = new scala.util.Random(42)
    val a = agg(32)
    for (_ <- 1 to 20) {
      // heavy duplication + values straddling the k-th minimum
      val xs = Seq.fill(500)(rnd.nextLong(200L)) ++
        Seq.fill(100)(rnd.nextLong(1L << 60))
      val whole = runSeq(a, xs)
      // random 3-way split, merged in shuffled order, with serde between
      val parts = xs.grouped(xs.size / 3 + 1).toSeq
      val bufs = rnd.shuffle(parts.map(runSeq(a, _)))
      val merged = bufs.map(b => a.deserialize(a.serialize(b)))
        .reduce(a.merge)
      assert(merged === whole, "merge order / serde must not matter")
      assert(a.eval(merged) === a.eval(whole))
    }
  }

  test("estimate formula: exact below k, (k−1)·2⁶⁰/h_k at k") {
    val a = agg(16)
    assert(a.eval(runSeq(a, Seq(5L, 5L, 7L))) === 2L)
    assert(a.eval(a.createAggregationBuffer()) === 0L)
    // 16 distinct hashes, h_k = the largest retained
    val hashes = Seq.tabulate(16)(i => (i + 1).toLong * 1000L)
    val est = a.eval(runSeq(a, hashes ++ hashes)).asInstanceOf[Long]
    assert(est === ((BigInt(15) << 60) / BigInt(16000L)).toLong)
  }

  test("out-of-domain hash input fails loudly") {
    val a = agg(16)
    intercept[IllegalStateException] {
      runSeq(a, Seq(-1L))
    }
    intercept[IllegalStateException] {
      runSeq(a, Seq(KmvDistinct.HashMax + 1))
    }
    intercept[IllegalArgumentException] { agg(8) } // k floor is 16
  }

  test("kmv_distinct over kmvHash60 ≡ exact distinct below k, any layout") {
    // 300 distinct longs < k=1024 and < k=512: both exact regime; the
    // grouped case exercises per-group TreeSet state
    val df = withLogLevel(
      spark.range(0, 3000).selectExpr("id % 300 as v", "id % 2 as g"))
      .select(col("g"), KmvDistinct.kmvHash60(col("v")).as("h"))
    val flat = df.agg(KmvDistinct.kmv_distinct(col("h"))).head().getLong(0)
    assert(flat === 300L)
    val grouped = df.repartition(11).groupBy("g")
      .agg(KmvDistinct.kmv_distinct(col("h"), 512).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grouped === Map(0L -> 150L, 1L -> 150L))
  }
}
