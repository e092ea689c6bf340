package graft

/**
 * The gate registry's shared plumbing: cache release must be safe
 * mid-session (Bench calls it between the sweep and the parity family)
 * and the rebuilt state must answer identically — a released cache that
 * changed answers would silently corrupt every entry measured after the
 * reset.
 */
class GateSupportSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("releaseCaches drops index state and queries rebuild identically") {
    withLogLevel {
      def run(name: String): Seq[String] =
        SparkEntry.queries(name)(spark, dir).collect()
          .map(_.toString).sorted.toSeq

      // fill every cache family: LSH + IVF probes, term index, eval
      // query set, BM25 stats, prepared graph
      val names = Seq("q_lsh_topk", "q_ivf_topk", "text_bm25_indexed",
        "eval_ann_recall", "text_bm25", "graph_pagerank")
      val before = names.map(n => n -> run(n)).toMap
      assert(GateSupport.lshCache.size() + GateSupport.ivfCache.size() > 0,
        "expected index caches to be filled by the probe queries")

      SparkEntry.releaseCaches()
      assert(GateSupport.lshCache.isEmpty && GateSupport.ivfCache.isEmpty &&
        GateSupport.termIndexCache.isEmpty &&
        GateSupport.evalQueryCache.isEmpty &&
        GateSupport.preparedGraphCache.isEmpty)

      names.foreach { n =>
        assert(run(n) == before(n), s"$n changed answers after releaseCaches")
      }
    }
  }

  test("events_json_props skips dirty props rows instead of killing the job (r13)") {
    // Under ANSI (Spark 4 default) the gate query's old plain cast threw
    // CAST_INVALID_INPUT on the first non-integer '$.k' — one dirty row
    // killed the job; try_cast skips it. Pin the skip set: JSON null,
    // non-integer number, and non-numeric string all drop; integer
    // string and bare integer stay.
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val df = withLogLevel(Seq(
      ("a", """{"k": 12}"""), ("a", """{"k": 12.7}"""), ("a", """{"k": "abc"}"""),
      ("a", """{"k": null}"""), ("a", """{"k": "15"}"""), ("b", """{"x": 1}""")
    ).toDF("event_type", "props"))
    val k = expr("try_cast(get_json_object(props, '$.k') AS LONG)")
    val got = df.select(col("event_type"), k.as("__k"))
      .filter(col("__k").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 12L), ("a", 15L)))
  }

  test("census contract: every query is oracle-gated — zero rows-only entries") {
    // The rows-only set emptied over the rounds: emb_coreset left in
    // r10 (unrolled argmin CTE replay); profile_quantiles_approx and
    // emb_whitened left in r14 (md5-bucket sample + exact
    // interpolation; whitened-covariance-is-identity invariance); and
    // profile_stats_approx left in r14 too — its HLL++ tier (engine-
    // internal register state, no cross-engine replay) was replaced by
    // a KMV bottom-k sketch whose k smallest md5 hashes ANY engine
    // reproduces. Every gate entry now has a strict DuckDB oracle; a
    // query missing one is census drift the driver would silently
    // downgrade to a weaker rows-only check.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"oracle coverage drifted: undocumented rows-only = $missing")
    // and no orphan oracles for queries that don't exist
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("evalQueries survives a cache release and returns the same 16 rows") {
    withLogLevel {
      val a = GateSupport.evalQueries(spark, dir).collect().map(_.toString).sorted
      SparkEntry.releaseCaches()
      val b = GateSupport.evalQueries(spark, dir).collect().map(_.toString).sorted
      assert(a.sameElements(b))
      assert(a.length == 16)
    }
  }
}
