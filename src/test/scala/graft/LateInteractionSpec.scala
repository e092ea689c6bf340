package graft

import graft.ops.LateInteraction

class LateInteractionSpec extends SparkSuite {
  import spark.implicits._

  test("maxSim picks the best sub-vector match per query part") {
    // 4-dim vectors as 2 sub-vectors of 2. Query parts: (1,0) and (0,1).
    // doc A has both parts in order; doc B has them SWAPPED — MaxSim is
    // permutation-invariant across parts so both score identically; doc C
    // only matches part 1.
    val df = withLogLevel(Seq(
      ("A", Array(1.0f, 0.0f, 0.0f, 1.0f)),
      ("B", Array(0.0f, 1.0f, 1.0f, 0.0f)),
      ("C", Array(1.0f, 0.0f, 1.0f, 0.0f)),
      ("D", Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "v"))
    val q = Array(1.0f, 0.0f, 0.0f, 1.0f)
    val r = LateInteraction.maxSimTopK(df, "v", "id", q, 2, 4)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    // scale=1e7 ⇒ unit dot = 1e14
    val u = 100000000000000L
    assert(r.toMap === Map("A" -> 2 * u, "B" -> 2 * u, "C" -> u, "D" -> 0L))
    assert(r.map(_._1).toSeq === Seq("A", "B", "C", "D")) // score desc, id asc
  }

  test("single-vector degenerate case equals the plain dot product") {
    val df = withLogLevel(Seq(
      ("x", Array(0.5f, 0.5f)), ("y", Array(1.0f, 0.0f))).toDF("id", "v"))
    val r = LateInteraction
      .maxSimTopK(df, "v", "id", Array(1.0f, 0.0f), 1, 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("y") === 100000000000000L && r("x") === 50000000000000L)
  }

  test("rows with the wrong dimension are excluded, not errors") {
    val df = withLogLevel(Seq(
      ("ok", Array(1.0f, 0.0f)), ("bad", Array(1.0f, 0.0f, 0.0f))
    ).toDF("id", "v"))
    val r = LateInteraction.maxSimTopK(df, "v", "id", Array(1.0f, 0.0f), 1, 5)
      .collect().map(_.getString(0)).toSeq
    assert(r === Seq("ok"))
  }
}
