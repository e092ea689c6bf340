package graft

import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val canon = withLogLevel(
    Seq("united states", "germany", "france").toDF("country"))

  test("bestMatch resolves typos to the closest canonical value") {
    val dirty = Seq(
      (1L, "united statez"),   // dist 1 -> united states
      (2L, "germany"),         // exact
      (3L, "franze"),          // dist 1 -> france
      (4L, "japan")            // no match within 2
    ).toDF("id", "raw")
    val r = FuzzyJoin.bestMatch(dirty, canon, "raw", "country", maxDist = 2)
      .collect().map(x => x.getLong(0) -> ((x.getString(2), x.getInt(3)))).toMap
    assert(r(1L) === (("united states", 1)))
    assert(r(2L) === (("germany", 0)))
    assert(r(3L) === (("france", 1)))
    assert(!r.contains(4L), "rows with no candidate in range are dropped")
  }

  test("equidistant candidates break ties lexicographically") {
    val c = Seq("aa", "ab", "ba").toDF("v")
    val r = FuzzyJoin.bestMatch(Seq((1L, "ax")).toDF("id", "raw"),
      c, "raw", "v", maxDist = 1).collect().head
    // "aa" and "ab" are both dist 1; "aa" < "ab"
    assert(r.getString(2) === "aa" && r.getInt(3) === 1)
  }

  test("the canonical side broadcasts; no shuffle of the candidate fan-out") {
    val dirty = Seq((1L, "germany")).toDF("id", "raw")
    val p = FuzzyJoin.bestMatch(dirty, canon, "raw", "country", 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    intercept[IllegalArgumentException](
      FuzzyJoin.bestMatch(dirty, canon, "raw", "country", -1))
  }
}
