package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("offsets are a per-shard cumulative sum in id order") {
    // one shard so the layout is a single stream we can check by hand
    val df = withLogLevel(Seq(
      (1L, "a b c"),            // 3 tokens  [0, 3)
      (2L, "d e"),              // 2 tokens  [3, 5)
      (3L, "f g h i j k")       // 6 tokens  [5, 11)
    ).toDF("id", "text"))
    val r = Packing.contiguousOffsets(df, "id", "text", 4, 1)
      .collect()
      .map(x => x.getLong(0) -> ((x.getAs[Long]("start_offset"),
        x.getAs[Long]("pack_first"), x.getAs[Long]("pack_last")))).toMap
    assert(r(1L) === ((0L, 0L, 0L)))
    assert(r(2L) === ((3L, 0L, 1L)), "doc 2 straddles the pack boundary at 4")
    assert(r(3L) === ((5L, 1L, 2L)), "doc 3 spans tokens 5..10 = packs 1..2")
  }

  test("sharding is deterministic, complete, and re-partition stable") {
    val df = withLogLevel(spark.range(0, 2000)
      .select($"id", concat(lit("tok "), $"id".cast("string")).as("text")))
    val a = Packing.contiguousOffsets(df, "id", "text", 128, 8)
    assert(a.count() === 2000L)
    assert(a.select("shard").distinct().count() === 8L)
    // within every shard offsets are gapless: sum(tokens) = max(end)
    val per = a.groupBy("shard")
      .agg(sum("n_tokens").as("t"),
        max(col("start_offset") + col("n_tokens")).as("e"))
      .collect()
    per.foreach(r => assert(r.getLong(1) === r.getLong(2), r.toString))
    val b = Packing.contiguousOffsets(df.repartition(13), "id", "text", 128, 8)
    assert(b.except(a).count() === 0L && a.except(b).count() === 0L)
  }

  test("plan is one exchange by shard + one window — no global sort") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val p = Packing.contiguousOffsets(df, "id", "text", 16, 4)
      .queryExecution.executedPlan.toString
    assert(countOf(p, "Exchange") === 1, s"exactly one shuffle (by shard):\n$p")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"no global order-by:\n$p")
  }

  private def countOf(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)
}
