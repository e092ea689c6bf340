package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank: integer-exact ranks on a known 4-node graph") {
    // a -> b, a -> c, b -> c, c -> a  (the classic worked example)
    val edges = withLogLevel(Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst"))
    val r1 = Graph.pageRank(edges, "src", "dst", 1, scale = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // base = 15; contribs at rank 100: a/2=50 to b and c, b->c 100, c->a 100
    assert(r1 === Map(
      "a" -> (15L + 85L * 100L / 100L),         // 100
      "b" -> (15L + 85L * 50L / 100L),          // 57
      "c" -> (15L + 85L * (50L + 100L) / 100L)  // 142
    ))
  }

  test("pageRank: sinks keep base rank, total mass never grows") {
    val edges = withLogLevel(Seq(("a", "b"), ("c", "b")).toDF("src", "dst"))
    val r = Graph.pageRank(edges, "src", "dst", 3, scale = 1000000L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") === 150000L && r("c") === 150000L) // no in-edges: base only
    assert(r("b") > r("a"))
    assert(r.values.sum <= 3L * 1000000L)
  }

  test("pageRank is deterministic under repartitioning") {
    val edges = withLogLevel(
      (0 until 300).map(i => (s"n${i % 50}", s"n${(i * 7) % 50}"))
        .toDF("src", "dst"))
    val a = Graph.pageRank(edges, "src", "dst", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Graph.pageRank(edges.repartition(7), "src", "dst", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("tradeGraph builds a symmetric distinct edge list") {
    val orders = Seq((1L, 10L), (2L, 20L)).toDF("o_orderkey", "o_custkey")
    val li = withLogLevel(Seq((1L, 5L), (1L, 5L), (2L, 5L))
      .toDF("l_orderkey", "l_suppkey"))
    val e = Graph.tradeGraph(orders, li)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e === Set(("c10", "s5"), ("s5", "c10"), ("c20", "s5"), ("s5", "c20")))
  }

  test("tradeGraphIds ≡ tradeGraph after decode") {
    val orders = Seq((1L, 10L), (2L, 20L), (3L, 10L))
      .toDF("o_orderkey", "o_custkey")
    val li = withLogLevel(Seq((1L, 5L), (2L, 5L), (3L, 7L), (3L, 5L))
      .toDF("l_orderkey", "l_suppkey"))
    val strs = Graph.tradeGraph(orders, li)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val decoded = Graph.tradeGraphIds(orders, li)
      .select(Graph.decodeTradeNode(col("src")).as("src"),
        Graph.decodeTradeNode(col("dst")).as("dst"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(decoded === strs)
  }

  test("PreparedGraph: build once, repeated pageRank calls are bit-equal") {
    val edges = withLogLevel(
      (0 until 300).map(i => ((i % 50).toLong, ((i * 7) % 50).toLong))
        .toDF("src", "dst"))
    val g = Graph.PreparedGraph.build(edges, "src", "dst")
    val a = g.pageRank(3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = g.pageRank(3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Graph.pageRank(edges, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(a === direct)
  }

  test("pageRank: lineage stays bounded via periodic snapshots at high iteration counts") {
    val edges = withLogLevel(Seq(
      ("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst"))
    // 25 rounds with checkpointEvery=5: without the periodic snapshot the
    // plan tree grows exponentially-deep; with it this completes fast and
    // conserves mass
    val r = Graph.pageRank(edges, "src", "dst", 25, scale = 1000000L,
        checkpointEvery = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size === 3)
    // symmetric 3-cycle: all ranks converge to the initial mass
    assert(r.values.forall(v => math.abs(v - 1000000L) < 10L), r.toString)
  }
}
