package graft

import org.apache.spark.sql.functions._

import graft.ops.Splits

class SplitsSpec extends SparkSuite {
  import spark.implicits._

  test("split assignment is deterministic, complete, and ~proportional") {
    val df = withLogLevel(spark.range(0, 10000).toDF("id"))
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Splits.assign(df, "id", fr)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L, "every row lands in exactly one split")
    assert(math.abs(counts("train") - 8000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 150, counts.toString)
    // re-running (and re-partitioning) yields the identical assignment
    val b = Splits.assign(df.repartition(7), "id", fr)
    assert(a.join(b.withColumnRenamed("split", "s2"), Seq("id"))
      .filter($"split" =!= $"s2").count() === 0L)
  }

  test("fractions must be sane") {
    val df = spark.range(2).toDF("id")
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq("a" -> 0.5, "b" -> 0.2)))
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq.empty))
  }
}
