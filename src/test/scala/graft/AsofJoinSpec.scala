package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  // left: observations at t; right: state changes at t with a value
  private lazy val obs = withLogLevel(Seq(
    (1L, 10L, "a"),
    (1L, 20L, "b"),
    (1L, 35L, "c"),
    (2L, 5L, "d"),   // before any right row for key 2
    (3L, 50L, "e")   // key absent from right entirely
  ).toDF("k", "t", "tag"))

  private lazy val states = withLogLevel(Seq(
    (1L, 10L, 100L, "s10"),
    (1L, 30L, 101L, "s30"),
    (2L, 7L, 102L, "s7")
  ).toDF("k", "st", "sid", "sval"))

  private def run(inclusive: Boolean, joinType: String = "left") =
    AsofJoin.asofJoin(obs, states, key = "k", leftTime = "t",
      rightTime = "st", rightCols = Seq("sid", "sval"),
      inclusive = inclusive, tieBreak = Some("sid"), joinType = joinType)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

  test("inclusive as-of picks most recent state at or before each row") {
    assert(run(inclusive = true) === Set(
      (1L, 10L, "a", 100L),  // equal time matches when inclusive
      (1L, 20L, "b", 100L),
      (1L, 35L, "c", 101L),
      (2L, 5L, "d", -1L),    // no prior state -> null
      (3L, 50L, "e", -1L)))  // key never seen on right -> null
  }

  test("strict as-of excludes equal-time right rows") {
    assert(run(inclusive = false) === Set(
      (1L, 10L, "a", -1L),   // the t=10 state no longer matches
      (1L, 20L, "b", 100L),
      (1L, 35L, "c", 101L),
      (2L, 5L, "d", -1L),
      (3L, 50L, "e", -1L)))
  }

  test("inner join type drops unmatched left rows") {
    val r = run(inclusive = true, joinType = "inner")
    assert(r.map(_._3) === Set("a", "b", "c"))
  }

  test("tieBreak resolves equal right timestamps to the max") {
    val dupStates = states.union(Seq((1L, 10L, 999L, "s10b")).toDF())
    val r = AsofJoin.asofJoin(obs.filter($"k" === 1 && $"t" === 20),
      dupStates, "k", "t", "st", Seq("sid"), tieBreak = Some("sid"))
      .select("sid").as[Long].collect()
    assert(r.toSeq === Seq(999L))
  }

  test("forward direction picks the nearest state at or after each row") {
    val fwd = AsofJoin.asofJoin(obs, states, key = "k", leftTime = "t",
      rightTime = "st", rightCols = Seq("sid"),
      tieBreak = Some("sid"), direction = "forward")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(fwd === Set(
      (1L, 10L, 100L),  // equal time matches when inclusive
      (1L, 20L, 101L),  // next state is t=30
      (1L, 35L, -1L),   // nothing after 35
      (2L, 5L, 102L),
      (3L, 50L, -1L)))
    // strict forward: the t=10 state no longer matches the t=10 row
    val strict = AsofJoin.asofJoin(obs.filter($"t" === 10), states,
      "k", "t", "st", Seq("sid"), inclusive = false, direction = "forward")
      .select("sid").as[Long].collect()
    assert(strict.toSeq === Seq(101L))
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(obs, states, "k", "t", "st", Seq("sid"),
        direction = "sideways")
    }
  }

  test("collision and type validation") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(obs, states.withColumnRenamed("sval", "tag"),
        "k", "t", "st", Seq("tag"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(obs, states, "k", "t", "st", Seq("sid"),
        joinType = "full_outer")
    }
  }

  test("dotted and spaced column names survive the payload round-trip (r13)") {
    // names travel as struct fields: a dotted name used to misparse as a
    // nested path in the output projection (and in the payload struct
    // construction); backtick-quoted construction + getField extraction
    // support any name except a literal backtick, which rejects loudly
    val l = obs.withColumnRenamed("tag", "obs.tag")
    val r = states.withColumnRenamed("sval", "state val")
    val out = AsofJoin.asofJoin(l, r, key = "k", leftTime = "t",
      rightTime = "st", rightCols = Seq("state val"),
      tieBreak = Some("sid"))
    assert(out.columns.toSeq === Seq("k", "t", "obs.tag", "state val"))
    val got = out.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        Option(x.getString(3)).getOrElse("-"))).toSet
    assert(got === Set(
      (1L, 10L, "a", "s10"), (1L, 20L, "b", "s10"), (1L, 35L, "c", "s30"),
      (2L, 5L, "d", "-"), (3L, 50L, "e", "-")))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l.withColumnRenamed("obs.tag", "bad`tick"), r,
        "k", "t", "st", Seq("state val"))
    }
    assert(e.getMessage.contains("backtick"))
  }

  test("plan is one shuffle, zero join operators") {
    val df = AsofJoin.asofJoin(obs, states, "k", "t", "st", Seq("sid"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Cartesian"),
      s"as-of must not plan a join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$p")
  }
}
