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
}
