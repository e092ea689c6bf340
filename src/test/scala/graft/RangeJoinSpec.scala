package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val pts = withLogLevel(Seq(
    (1L, 5L, "p5"),
    (1L, 10L, "p10"),
    (1L, 25L, "p25"),
    (1L, 30L, "p30"),
    (2L, 10L, "q10"),
    (3L, -7L, "n7")   // negative position exercises floor (not truncate) binning
  ).toDF("k", "pos", "ptag"))

  private lazy val ivs = withLogLevel(Seq(
    (1L, 0L, 10L, "i0"),    // [0,10): catches p5, not p10 (exclusive end)
    (1L, 8L, 31L, "i8"),    // spans 4 bins of width 8: p10, p25, p30
    (2L, 0L, 100L, "iq"),   // other key
    (3L, -10L, -5L, "in")   // negative interval: catches n7
  ).toDF("k", "lo", "hi", "itag"))

  private def pairs(endInclusive: Boolean = false) =
    RangeJoin.binnedRangeJoin(pts, ivs, "k", "pos", "lo", "hi",
      binWidth = 8, endInclusive = endInclusive)
      .select("ptag", "itag").as[(String, String)].collect().toSeq

  test("matches each point-interval containment exactly once") {
    val got = pairs()
    assert(got.size === got.distinct.size, s"duplicate pairs: $got")
    assert(got.toSet === Set(
      ("p5", "i0"), ("p10", "i8"), ("p25", "i8"), ("p30", "i8"),
      ("q10", "iq"), ("n7", "in")))
  }

  test("endInclusive admits points at the interval end") {
    assert(pairs(endInclusive = true).toSet
      === pairs().toSet + (("p10", "i0")))
  }

  test("oversized interval raises instead of silently truncating") {
    val wide = Seq((1L, 0L, 10000L, "w")).toDF("k", "lo", "hi", "itag")
    val e = intercept[Exception] {
      RangeJoin.binnedRangeJoin(pts, wide, "k", "pos", "lo", "hi",
        binWidth = 8, maxBinsPerInterval = 16).collect()
    }
    assert(e.getMessage.contains("widen binWidth")
      || e.getCause != null && e.getCause.getMessage.contains("widen binWidth"))
  }

  test("column collision validation") {
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(pts, ivs.withColumnRenamed("itag", "ptag"),
        "k", "pos", "lo", "hi", binWidth = 8)
    }
  }

  test("plan is an equi-join — no nested-loop or cartesian fallback") {
    val df = RangeJoin.binnedRangeJoin(pts, ivs, "k", "pos", "lo", "hi",
      binWidth = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("Cartesian"),
      s"range join must stay an equi-join:\n$p")
    assert(p.contains("Join"), s"expected a hash/merge equi-join:\n$p")
  }

  test("equivalence with brute-force inequality join on random data") {
    val r = new scala.util.Random(7)
    val rp = (1 to 300).map(i =>
      (r.nextInt(4).toLong, r.nextInt(2000).toLong - 1000, s"p$i"))
      .toDF("k", "pos", "ptag")
    val ri = (1 to 80).map { i =>
      val lo = r.nextInt(2000).toLong - 1000
      (r.nextInt(4).toLong, lo, lo + r.nextInt(120), s"i$i")
    }.toDF("k", "lo", "hi", "itag")
    val binned = RangeJoin.binnedRangeJoin(rp, ri, "k", "pos", "lo", "hi",
      binWidth = 64).select("ptag", "itag").as[(String, String)].collect().toSet
    val brute = rp.as("p").join(ri.as("i"),
        $"p.k" === $"i.k" && $"p.pos" >= $"i.lo" && $"p.pos" < $"i.hi")
      .select("ptag", "itag").as[(String, String)].collect().toSet
    assert(binned === brute)
  }

  test("null interval bounds expand to zero bins instead of killing the job (r12)") {
    // a null span is not-true in BOTH guards and used to fall through
    // to raise_error — one dirty row killed the whole job (with a null
    // message) instead of simply not matching
    val dirty = withLogLevel(Seq(
      (1L, Some(0L), None: Option[Long], "bad"),
      (1L, Some(0L), Some(10L), "good")
    ).toDF("k", "lo", "hi", "itag"))
    val got = RangeJoin.binnedRangeJoin(pts, dirty, "k", "pos", "lo", "hi",
      binWidth = 8).select("ptag", "itag").as[(String, String)].collect().toSet
    assert(got === Set(("p5", "good")), s"got $got")
  }

  test("a pre-existing __bin column fails loudly instead of being silently destroyed (r12)") {
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(pts.withColumn("__bin", lit(1L)), ivs,
        "k", "pos", "lo", "hi", binWidth = 8)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(pts, ivs.withColumn("__bin", lit(1L)),
        "k", "pos", "lo", "hi", binWidth = 8)
    }
  }
}
