package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph propagation over an edge list — the canonical iterative Spark
 * workload (link analysis for crawl-corpus curation: page authority as a
 * training-data quality prior, à la the CommonCrawl-derived corpora).
 *
 * Exactness contract: classic PageRank sums float contributions, and float
 * addition is order-dependent — under Spark's nondeterministic partial
 * aggregation two runs can hash-differently. Here rank mass is an INTEGER
 * (`scale` units = rank 1.0) and every step is integer arithmetic:
 *
 *   contrib(v)  = rank(v) DIV outdeg(v)
 *   rank'(v)    = (15*scale) DIV 100  +  (85 * Σ_in contrib) DIV 100
 *
 * `DIV` truncates toward zero in both Spark and DuckDB, so the result is
 * bit-reproducible and SQL-replayable. Truncation loses < outdeg(v) units
 * of mass per node per round — at scale=1e9 that is ≤ 1e-6 of a unit
 * rank, far below ranking-relevant differences.
 *
 * Scale shape: each iteration is one (rank ⋈ edges) shuffle on src plus
 * one hash aggregate on dst — the minimum any edge-partitioned PageRank
 * pays. The out-degreed edge list and node set are snapshotted ONCE via
 * checkpoint (reliable if the session has a checkpoint dir, local
 * otherwise) rather than `persist`: checkpoint blocks are RDD-level, so
 * the ContextCleaner frees them when the returned frame is
 * garbage-collected — a CacheManager `persist` here would live (and
 * compete with every later cached frame) for the whole session, since
 * no unpersist point exists once the frame is handed to the caller.
 * Ranks are re-snapshotted every `checkpointEvery` rounds so lineage
 * stays bounded at hundreds of iterations. Overflow bound:
 * 85 · totalMass = 85 · |V| · scale must stay under 2^63 — at scale=1e9
 * that allows ~10^8 nodes; drop `scale` for larger graphs.
 */
object Graph {

  /**
   * Integer-exact PageRank with damping 0.85 over a directed edge list.
   * Returns (node, rank) with rank in `scale` units (BIGINT).
   *
   * @param edges  DataFrame with the two endpoint columns; duplicate edges
   *               are NOT collapsed (parallel edges weight contributions),
   *               callers wanting simple-graph semantics pass `.distinct`.
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000000L,
      checkpointEvery: Int = 10): DataFrame =
    PreparedGraph.build(edges, srcCol, dstCol)
      .pageRank(iterations, scale, checkpointEvery)

  /**
   * A graph prepared for iteration: out-degreed edge list and node set
   * snapshotted once. The prepare phase is the expensive part of any
   * iterative graph computation over derived edges (typically a join +
   * distinct upstream); callers running pageRank repeatedly — different
   * iteration counts, damping experiments, periodic re-rank over the
   * same corpus snapshot — build once and iterate many times, the same
   * build/query split as [[VectorIndex]].
   *
   * Lifecycle: snapshots are RDD-level blocks (checkpoint when the
   * session has a checkpoint dir — survives executor loss, the right
   * tier on a real cluster — localCheckpoint otherwise), NOT
   * CacheManager entries: when this object and the frames derived from
   * it become unreachable, the ContextCleaner frees the blocks. A
   * `persist` here would live for the whole session with no sound
   * unpersist point.
   */
  final class PreparedGraph private[Graph] (
      val eDeg: DataFrame,
      val nodes: DataFrame,
      snap: DataFrame => DataFrame) {

    /** Integer-exact PageRank over the prepared graph (damping 0.85). */
    def pageRank(
        iterations: Int,
        scale: Long = 1000000000L,
        checkpointEvery: Int = 10): DataFrame = {
      require(iterations >= 1, "iterations must be >= 1")
      require(scale > 0, "scale must be > 0")
      require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
      val base = (15L * scale) / 100L
      var ranks = nodes.withColumn("rank", lit(scale))
      for (i <- 1 to iterations) {
        // one join (ranks onto out-degreed edges) + one dst-aggregate;
        // at small node counts AQE broadcasts the rank side at runtime,
        // at 1e8+ nodes it stays a shuffle join — no hard-coded hint
        val inSum = eDeg.join(ranks, eDeg("src") === ranks("node"))
          .select(col("dst").as("node"), expr("rank DIV deg").as("c"))
          .groupBy("node")
          .agg(sum("c").as("s"))
        ranks = nodes
          .join(inSum, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("85 * coalesce(s, 0L) DIV 100")).as("rank"))
        // bound lineage at high iteration counts; a superseded snapshot
        // becomes unreachable after the next one and its blocks GC-free
        if (i % checkpointEvery == 0 && i < iterations) ranks = snap(ranks)
      }
      ranks
    }
  }

  object PreparedGraph {
    def build(edges: DataFrame, srcCol: String, dstCol: String): PreparedGraph = {
      val snap: DataFrame => DataFrame =
        if (edges.sparkSession.sparkContext.getCheckpointDir.isDefined)
          df => df.checkpoint(eager = true)
        else df => df.localCheckpoint(eager = true)
      // Snap the bare edge list FIRST: the degree join below is a
      // self-join, and the node set reads the edges again — deriving
      // either from a lazy `e` would re-run the upstream edge derivation
      // (often an expensive join + distinct) once per branch. After this
      // one job, everything downstream reads the snapshot.
      val e = snap(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      // (src, dst, deg) rides every round's join — snapshot it so the
      // degree aggregate + join run once, not once per round
      val eDeg = snap(e.join(outdeg, Seq("src")))
      // every endpoint is a node, including pure sinks (no out-edges)
      val nodes = snap(e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
      new PreparedGraph(eDeg, nodes, snap)
    }
  }

  /**
   * Undirected customer↔supplier trade graph from the TPC-H-ish tables:
   * one edge per distinct (customer, supplier) trading pair, both
   * directions, nodes disambiguated as "c<key>" / "s<key>".
   */
  def tradeGraph(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
    // both directions via explode, NOT union: union's two branches would
    // each evaluate `pairs` — running the join + distinct twice per pass
    pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("edge"))
      .select(col("edge.src").as("src"), col("edge.dst").as("dst"))
  }

  /**
   * [[tradeGraph]] with fixed-width BIGINT node ids instead of strings:
   * customer key k → 2k, supplier key k → 2k+1. Long keys hash and
   * compare in constant time and shuffle at 8 bytes/key — the layout an
   * iterative computation wants when every round joins and aggregates on
   * the node id (variable-length string keys pay per-round hashing and
   * bytes proportional to key length). Decode for presentation with
   * [[decodeTradeNode]] — a map-only projection on the FINAL (small)
   * rank frame, never on the edge list.
   */
  def tradeGraphIds(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("a"),
        (col("l_suppkey").cast("long") * 2 + 1).as("b"))
      .distinct()
    pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("edge"))
      .select(col("edge.src").as("src"), col("edge.dst").as("dst"))
  }

  /** Inverse of [[tradeGraphIds]]'s encoding: "c<key>" / "s<key>".
    * shiftright keeps the halving in integer arithmetic — `/ 2` would
    * detour through double division. */
  def decodeTradeNode(node: Column): Column =
    when(node % 2 === 0, concat(lit("c"), shiftright(node, 1)))
      .otherwise(concat(lit("s"), shiftright(node, 1)))
}
