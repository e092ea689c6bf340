package graft

import org.apache.spark.sql.functions._

import graft.ops.Funnel

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  // (user, t, type)
  private lazy val ev = withLogLevel(Seq(
    (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"),   // full funnel
    (2L, 3L, "B"), (2L, 5L, "A"),                  // B only BEFORE A
    (3L, 1L, "A"), (3L, 2L, "B"),                  // no C
    (4L, 1L, "B"), (4L, 2L, "C"),                  // never did A
    // first-match semantics: first B after A is t=15, so C@12 is too early
    (5L, 10L, "A"), (5L, 5L, "B"), (5L, 15L, "B"), (5L, 12L, "C")
  ).toDF("u", "t", "typ"))

  test("ordered funnel counts users stage by stage, first-match clock") {
    val r = Funnel.funnel(ev, "u", "t", "typ", Seq("A", "B", "C"))
      .collect().map(x => x.getInt(0) -> ((x.getString(1), x.getLong(2))))
      .toMap
    assert(r(0) === (("A", 4L)))  // users 1, 2, 3, 5
    assert(r(1) === (("B", 3L)))  // users 1, 3, 5 (user 2's B precedes A)
    assert(r(2) === (("C", 1L)))  // user 1 only (user 5's C precedes its B)
  }

  test("null timestamps cannot anchor a stage (r12)") {
    // a user whose step-1 events are all null-ts used to count at stage
    // 0 (count counts the row, min(null)=null) while never being able
    // to advance — inflating exactly one stage
    val ev2 = Seq(
      (1L, Some(1L), "A"), (1L, Some(2L), "B"),
      (2L, None: Option[Long], "A"), (2L, Some(5L), "B")
    ).toDF("u", "t", "typ")
    val r = Funnel.funnel(ev2, "u", "t", "typ", Seq("A", "B"))
      .collect().map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(r(0) === 1L, "user 2's null-ts A must not count as reaching stage 0")
    assert(r(1) === 1L)
  }

  test("strict ordering: equal timestamps do not advance the funnel") {
    val tied = Seq((1L, 1L, "A"), (1L, 1L, "B")).toDF("u", "t", "typ")
    val r = Funnel.funnel(tied, "u", "t", "typ", Seq("A", "B"))
      .collect().map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(r(0) === 1L)
    assert(r.getOrElse(1, 0L) === 0L, "B at the same instant must not count")
  }

  test("funnel output is monotone non-increasing and single-step works") {
    val counts = Funnel.funnel(ev, "u", "t", "typ", Seq("A", "B", "C"))
      .orderBy("stage").collect().map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)), counts.toSeq.toString)
    val single = Funnel.funnel(ev, "u", "t", "typ", Seq("B")).collect()
    assert(single.length === 1 && single.head.getLong(2) === 5L)
    intercept[IllegalArgumentException](
      Funnel.funnel(ev, "u", "t", "typ", Nil))
  }

  test("each stage pushes its type filter into the scan side") {
    val p = Funnel.funnel(ev, "u", "t", "typ", Seq("A", "B"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(!p.contains("Window"), s"no full-stream window:\n$p")
  }
}
