package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate.topk_rows

class TopKAggregateSpec extends SparkSuite {
  import spark.implicits._

  test("topk_rows equals the window formulation across many groups (sort-fallback path)") {
    // 500 groups × ~40 rows forces ObjectHashAggregate past its in-hash
    // group limit (128) into sort-based fallback, exercising the
    // serialize/deserialize/merge path of the bounded heap.
    val df = withLogLevel(spark.range(0, 20000, 1, 8).select(
      pmod(xxhash64($"id"), lit(500)).as("g"),
      (xxhash64($"id" + 1) % 100000).cast("double").as("score"),
      $"id"))
    val viaAgg = df
      .groupBy($"g")
      .agg(topk_rows(struct($"score", $"id"), 3).as("tk"))
      .select($"g", explode($"tk").as("e"))
      .select($"g", $"e.score".as("score"), $"e.id".as("id"))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"g", $"score", $"id")
    val a = viaAgg.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted
    val b = viaWindow.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted
    assert(a.length === b.length)
    assert(a === b)
  }

  test("topk_rows output is sorted best-first within each group") {
    val df = Seq((1, 5.0, "a"), (1, 9.0, "b"), (1, 7.0, "c"), (1, 9.0, "a0"))
      .toDF("g", "score", "id")
    val rows = df.groupBy($"g")
      .agg(topk_rows(struct($"score", $"id"), 3).as("tk"))
      .select($"tk").head().getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(r => (r.getDouble(0), r.getString(1))) ===
      Seq((9.0, "a0"), (9.0, "b"), (7.0, "c"))) // score desc, id asc tiebreak
  }

  test("k larger than group size returns the whole group") {
    val df = Seq((1, 1.0, "x"), (1, 2.0, "y")).toDF("g", "score", "id")
    val rows = df.groupBy($"g")
      .agg(topk_rows(struct($"score", $"id"), 10).as("tk"))
      .select(size($"tk")).head().getInt(0)
    assert(rows === 2)
  }
}
