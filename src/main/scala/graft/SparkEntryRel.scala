package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Filters
import graft.ops.{Dedup, TextAnalysis, VectorSearch}
import graft.GateSupport._

/**
 * Relational/profiling gates: TPC-H-shaped aggregations and joins,
 * column profilers, sources round-trips, graph/layout/snapshot ops.
 *
 * One gate domain of [[SparkEntry]] (assembled there); every entry
 * keeps a matching oracle in this file so a query and its DuckDB
 * replay are reviewed together.
 */
private[graft] object SparkEntryRel {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- layout: z-order (Morton) clustering key over (user_id, cents)
    // — multi-dimension data-skipping sort key; unrolled bit interleave,
    // map-only, codegen'd ----
    "layout_zorder" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        graft.ops.Layout.zorderKey(
          col("user_id"), graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long")).as("zkey"))),

    // ---- versioned snapshots: commit two corpus versions to a fresh
    // SnapshotStore, then time-travel diff them (added/removed/changed
    // by id; the join carries (id, 8-byte row hash), never payloads) ----
    "snapshot_diff" -> ((s, dir) => {
      val st = snapshotStore(dir) {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val rootPath = java.nio.file.Files.createTempDirectory("graft_snap")
        deleteRecursivelyOnExit(rootPath)
        val store = new graft.persist.SnapshotStore(rootPath.toString)
        store.commit(d)
        store.commit(d.filter(col("doc_id") % 17 =!= 0)
          .withColumn("text", when(col("doc_id") % 10 === 0,
            upper(col("text"))).otherwise(col("text")))
          .unionByName(d.filter(col("doc_id") % 50 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))))
        store
      }
      st.diff(s, 1L, 2L, "doc_id")
    }),

    // ---- graph: integer-exact PageRank over the customer↔supplier trade
    // graph (3 rounds, damping 0.85). Rank mass is integer (scale units),
    // every step is DIV/sum arithmetic — bit-reproducible under any
    // partitioning and exactly replayable in SQL. Each round is one
    // src-join + one dst-aggregate, the minimal edge-partitioned shape.
    // Node ids are BIGINT through every round (8-byte shuffle keys,
    // constant-time hashing) and decode to "c<k>"/"s<k>" only in the
    // final small projection; the prepared graph is built once per dir ----
    "graph_pagerank" -> ((s, dir) => {
      val r = preparedTradeGraph(s, dir).pageRank(3)
      r.select(graft.ops.Graph.decodeTradeNode(col("node")).as("node"),
        col("rank"))
    }),

    // ---- JSONL sink → source round-trip: write the documents table as
    // line-delimited JSON, read it back with an EXPLICIT schema (no
    // inference pass — at 100 TB schema-on-read must not cost a scan),
    // and gate hash-equality against the parquet original: the
    // DocumentSource JSONL path is lossless end-to-end ----
    "src_jsonl_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      t(s, dir, "documents").write.mode("overwrite").json(tmp)
      s.read
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .json(tmp)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
    }),

    // ---- CSV sink → explicit-schema source round-trip (quoting/escape
    // surface: documents carry free text) — oracle is the original ----
    "src_csv_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
      t(s, dir, "documents").write.mode("overwrite")
        .option("header", "true").csv(tmp)
      s.read
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("header", "true")
        .csv(tmp)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
    }),

    // ---- relational: aggregation pipeline (TPC-H Q1 shape) ----
    // Exact-cents integer arithmetic: round to cents once, sum longs
    // (order-independent + exact in both engines, ~2x faster than
    // DECIMAL(38) accumulation), divide back out at the end.
    "agg_pricing_summary" -> ((s, dir) => {
      val priceCents = graft.functions.ColumnMath.roundHalfUp(col("l_extendedprice") * 100).cast("long")
      val discCents = graft.functions.ColumnMath.roundHalfUp(col("l_discount") * 100).cast("long")
      val qtyCenti = graft.functions.ColumnMath.roundHalfUp(col("l_quantity") * 100).cast("long")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(qtyCenti) / 100.0).as("sum_qty"),
          (sum(priceCents) / 100.0).as("sum_base"),
          (sum(priceCents * (lit(100L) - discCents)) / 10000.0).as("sum_disc"),
          count(lit(1)).as("n"))
    }),

    // ---- salted skew join: output is salt-INVARIANT (each left row
    // joins the replicated right side whatever its salt), so the plain
    // join is an exact oracle — the salting only changes the shuffle
    // key space from `okey` to (okey, salt), spreading hot keys over
    // saltFactor reducers ----
    "join_salted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"),
          graft.functions.ColumnMath.roundHalfUp(col("l_quantity") * 100).cast("long").as("qty_centi"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.ops.SkewJoin.saltedJoin(li, ord, "okey", saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), (sum(col("qty_centi")) / 100.0).as("sum_qty"))
    }),

    // ---- relational: grouping sets (ROLLUP) with null-free projection ----
    "agg_rollup" -> ((s, dir) => {
      val qtyCenti = graft.functions.ColumnMath.roundHalfUp(col("l_quantity") * 100).cast("long")
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), (sum(qtyCenti) / 100.0).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
    }),

    // ---- profiling: per-column stats in one scan (Profile op) ----
    "profile_stats" -> ((s, dir) =>
      graft.ops.Profile.numericProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // ---- profiling, sketch tier: KMV bottom-k distinct counts — no
    // EXPAND, one pass, state ≤ k longs/column, ~3% error at k=1024;
    // the 100 TB default for unbounded domains. STRICT oracle since
    // r14 (replaced HLL++): the k smallest md5 hashes are a pure
    // function of the value set, so DuckDB replays the hash, the
    // bottom-k, and the exact-integer (k−1)·2⁶⁰/h_k estimate —
    // bit-equal, and layout-invariant at every thread count ----
    "profile_stats_approx" -> ((s, dir) =>
      graft.ops.Profile.numericProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        exact = false)),

    // ---- profiling, sketch tier, INTEGRAL columns (r15): id-like
    // columns hash their RAW value — no round(v·100) quantization, so
    // distinct ids count correctly at any magnitude (the old multiply
    // overflowed long for |v| ≳ 9.2e16 and counted centi-units).
    // Exercises both KMV arms: l_linenumber (<1024 distinct → sketch IS
    // the count) and l_orderkey/l_partkey (>1024 → estimate) ----
    "profile_stats_approx_int" -> ((s, dir) =>
      graft.ops.Profile.numericProfile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_linenumber"),
        exact = false)),

    // ---- profiling: exact interpolated quartiles, one agg pass,
    // integer-cents scaling keeps the interpolation bit-exact ----
    "profile_quantiles" -> ((s, dir) =>
      graft.ops.Profile.quantileProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 100L)),

    // ---- profiling, sketch tier: exact interpolated quartiles over a
    // DETERMINISTIC md5-bucket row sample (r14 — replaced seeded
    // sample + GK percentile_approx). State bounded by the sample, not
    // the domain: the 100 TB default for unbounded high-cardinality
    // doubles. STRICT oracle since r14: membership is a pure function
    // of (l_orderkey, l_linenumber), so DuckDB replays the sample AND
    // the quantile_cont interpolation — and the tier is
    // layout-invariant at every thread count (the GK tier's CPUS=1
    // divergence is retired) ----
    "profile_quantiles_approx" -> ((s, dir) =>
      graft.ops.Profile.quantileProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 100L, exact = false,
        sampleKeyCols = Seq("l_orderkey", "l_linenumber"))),

    // ---- profiling: top-5 most frequent values per categorical column ----
    "profile_topvalues" -> ((s, dir) =>
      graft.ops.Profile.topValues(t(s, dir, "documents"),
        Seq("lang", "source"), 5)),

    // ---- profiling: Misra–Gries heavy hitters (fixed-memory sketch
    // tier of topValues). Gate corpus distinct (150–1.5k users) sits far
    // under capacity, so every counter is exact and the output equals
    // the exact top-10 — the documented deterministic regime.
    "profile_heavy_hitters" -> ((s, dir) =>
      graft.ops.Profile.heavyHitters(t(s, dir, "events"),
        "user_id", capacity = 8192, topN = 10)),

    // ---- profiling: exact-moment Pearson correlation (order-independent
    // decimal sums; only the closed-form combine is floating point).
    // The gate hashes ONLY the six exact integer moments — they fully
    // determine the correlation. Any double-derived scalar (corr,
    // round(corr,6), floor(corr·1e6)) is excluded: decimal(38)→double
    // rounding differs across engines once n·sxy exceeds 2^53, and any
    // 1-ulp drift survives both round and floor. The double `corr` is
    // tolerance-checked in ProfileCohortsSpec instead.
    // The five >64-bit moments travel as STRINGS: r5 hashed them as
    // decimal(38,0) vs DuckDB HUGEINT and still hash-failed with equal
    // values — a compare layer that widens int128-ish types to float64
    // on one side only (pandas has no int128) explains exactly that.
    // Decimal-string vs HUGEINT-string is conversion-proof.
    "profile_corr" -> ((s, dir) =>
      graft.ops.Profile.corrExact(t(s, dir, "lineitem"),
        Seq(("l_quantity", "l_extendedprice"),
          ("l_extendedprice", "l_discount")))
        .select(col("x_col"), col("y_col"), col("n"),
          col("sx").cast("string").as("sx"),
          col("sy").cast("string").as("sy"),
          col("sxy").cast("string").as("sxy"),
          col("sxx").cast("string").as("sxx"),
          col("syy").cast("string").as("syy"))),

    // ---- entity resolution: fuzzy best-match against a broadcast
    // canonical dimension (Levenshtein, deterministic argmin) ----
    "join_fuzzy" -> ((s, dir) => {
      val canon = s.createDataFrame(
        s.sparkContext.parallelize((0 to 9).map(i => Row(s"src$i"))),
        StructType(Seq(StructField("name", StringType))))
      graft.ops.FuzzyJoin.bestMatch(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        canon, "source", "name", maxDist = 1)
    }),

    // ---- profiling: fixed-width histogram, exact integer binning ----
    "profile_histogram" -> ((s, dir) =>
      graft.ops.Profile.histogram(t(s, dir, "lineitem"),
        "l_extendedprice", 5000.0)),

    // ---- profiling: EQUI-DEPTH histogram — edges are exact order
    // statistics (no interpolation, no doubles), the skew-honest
    // companion of the fixed-width bins ----
    "profile_histogram_eqdepth" -> ((s, dir) =>
      graft.ops.Profile.equiDepthHistogram(t(s, dir, "lineitem"),
        "l_extendedprice", buckets = 10)),

    // ---- events: FORWARD as-of — next click at/after each purchase
    // (time-to-next-action enrichment; same single-shuffle union+window
    // plan as the backward direction) ----
    "join_asof_fwd" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long").as("value_cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      graft.ops.AsofJoin.asofJoin(
          purchases, clicks, key = "user_id", leftTime = "ts",
          rightTime = "click_ts", rightCols = Seq("click_id", "click_ts"),
          tieBreak = Some("click_id"), joinType = "inner",
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("click_id"), col("click_ts"))
    }),

    // ---- relational: broadcast join + top-k by revenue ----
    // Aggregation pushed BELOW the join: lineitem pre-aggregates exact
    // integer-cents revenue per order (map-side partial combine shrinks
    // the shuffle ~4×), the order join reuses that hash partitioning
    // (no extra Exchange on the aggregated side), and only order-level
    // rows reach the customer rollup. Same exact sums — integer cents
    // are associative — so the oracle is unchanged.
    "join_top_customers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val priceCents = graft.functions.ColumnMath.roundHalfUp(col("l_extendedprice") * 100).cast("long")
      val discCents = graft.functions.ColumnMath.roundHalfUp(col("l_discount") * 100).cast("long")
      val revPerOrder = li
        .groupBy(col("l_orderkey"))
        .agg(sum(priceCents * (lit(100L) - discCents)).as("__rev"))
      revPerOrder.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg((sum(col("__rev")) / 10000.0).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(10)
    }),

    // ---- events: point-in-time (as-of) join — each purchase picks the
    // user's most recent click at-or-before it. Plan is union + ONE hash
    // exchange + sort + running last() window (no join operator at all);
    // AsofJoinSpec pins that shape ----
    "join_asof" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          graft.functions.ColumnMath.roundHalfUp(col("value") * 100).cast("long").as("value_cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      graft.ops.AsofJoin.asofJoin(
          purchases, clicks, key = "user_id", leftTime = "ts",
          rightTime = "click_ts", rightCols = Seq("click_id", "click_ts"),
          tieBreak = Some("click_id"), joinType = "inner")
        .select(col("event_id"), col("user_id"), col("value_cents"),
          col("click_id"), col("click_ts"))
    }),

    // ---- events: binned range join — attribute each click to the error
    // bursts ([error_ts, +6h)) it falls inside, per user. A bare
    // inequality join would plan BroadcastNestedLoop (O(|errors|·|clicks|)
    // comparisons); binning by the window width turns it into a plain
    // equi-join on (user, bin) with ≤2 replicas per interval —
    // RangeJoinSpec pins the no-nested-loop plan ----
    "join_range" -> ((s, dir) => {
      val ev = events(s, dir)
      val sixHoursUs = 6L * 3600 * 1000000
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"),
          unix_micros(col("ts")).as("err_us"),
          (unix_micros(col("ts")) + sixHoursUs).as("err_end_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_micros(col("ts")).as("click_us"))
      graft.ops.RangeJoin.binnedRangeJoin(
          clicks, errors, key = "user_id", pointCol = "click_us",
          startCol = "err_us", endCol = "err_end_us",
          binWidth = sixHoursUs)
        .select(col("err_id"), col("click_id"), col("user_id"),
          (col("click_us") - col("err_us")).as("delta_us"))
    }),

    // ---- relational: multiway broadcast join over the dim hierarchy ----
    "join_multiway" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_sup"))
    }),

    // ---- relational: TPC-H Q14 shape — monthly promo revenue share.
    // The part dimension broadcasts into the lineitem scan; share is an
    // exact integer quotient over DECIMAL(38) revenue sums ----
    "agg_promo_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      val rev = graft.functions.ColumnMath.roundHalfUp(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - graft.functions.ColumnMath.roundHalfUp(col("l_discount") * 100).cast("long"))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
        .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
            .as("promo_rev_e4"),
          sum(rev).as("total_rev_e4"))
        .withColumn("promo_share_e6",
          expr("CAST(promo_rev_e4 AS DECIMAL(38,0)) * 1000000 DIV total_rev_e4"))
    }),

    // ---- relational: the TPC-H Q5 plan shape — local-supplier revenue
    // by nation inside one region/year. Two fact-fact shuffle joins
    // (orders⋈customer, lineitem⋈supplier on key+nation), every
    // dimension BROADCAST, date + region filters pushed below the
    // joins, cents-exact revenue (the agg_pricing convention) ----
    "join_q5_shape" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(graft.functions.ColumnMath.roundHalfUp(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - graft.functions.ColumnMath.roundHalfUp(col("l_discount") * 100).cast("long")))
          / 10000.0).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // ---- relational: co-bucketed join through the persisted bucketed
    // layout (shuffle paid once at write, zero Exchange at join time —
    // plan property pinned in BucketedCorpusSpec) ----
    "join_bucketed" -> ((s, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_gate_bucketed"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.sources.BucketedCorpus.save(
        docs, "gate_bc_corpus", s"$tmp/corpus", buckets = 8, key = "doc_id")
      graft.sources.BucketedCorpus.save(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "gate_bc_stats", s"$tmp/stats", buckets = 8, key = "doc_id")
      s.table("gate_bc_corpus").join(s.table("gate_bc_stats"), "doc_id")
        .select(col("doc_id"), col("n_tokens"))
    }),

    // ---- relational: window rank (top-2 orders per customer) ----
    "window_order_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
    }),

    // ---- relational: set ops — customers without orders (EXCEPT) ----
    "set_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("k"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("k"))))

  )

  def oracleSql: Map[String, String] = Map(
    // The round-trip is lossless iff the reread JSONL hashes equal to
    // the parquet original — the oracle IS the original table.
    "src_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    // CSV round-trip must also be lossless against the parquet original.
    "src_csv_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty,
        |  sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_base,
        |  sum(round(l_extendedprice * 100)::BIGINT *
        |      (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS sum_disc,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "join_salted" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "profile_stats" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min($c)::DOUBLE AS mn, max($c)::DOUBLE AS mx
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),

    // KMV replay, per column: the same round(v·100) long rendering
    // (round is half-away-from-zero in both engines on the same IEEE
    // product), the same 60-bit md5-prefix hash (CAST('0x'||hex AS
    // BIGINT) ≡ Spark's conv(hex,16,10) at ≤15 chars), the bottom-1024
    // distinct hashes via ORDER BY h LIMIT 1024, and the exact-integer
    // estimate — HUGEINT // ≡ BigInt floor division on positives. Under
    // 1024 distinct hashes the sketch IS the count; both arms bit-equal
    // to the engine's TreeSet state by construction.
    "profile_stats_approx" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  (SELECT CASE WHEN count(*) < 1024 THEN count(*)
           |     ELSE ((1023::HUGEINT << 60) // greatest(max(h), 1))::BIGINT END
           |   FROM (SELECT h FROM (
           |       SELECT DISTINCT CAST('0x' || substring(md5(
           |         CAST(round($c * 100, 0)::BIGINT AS VARCHAR)), 1, 15) AS BIGINT) AS h
           |       FROM lineitem WHERE $c IS NOT NULL)
           |     ORDER BY h LIMIT 1024)) AS n_distinct,
           |  min($c)::DOUBLE AS mn, max($c)::DOUBLE AS mx
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),

    // integral columns replay with the RAW decimal rendering — DuckDB's
    // CAST(bigint/int AS VARCHAR) ≡ Java's Long.toString digits — and
    // no quantizing multiply (the r15 integral-key contract)
    "profile_stats_approx_int" ->
      Seq("l_orderkey", "l_partkey", "l_linenumber").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  (SELECT CASE WHEN count(*) < 1024 THEN count(*)
           |     ELSE ((1023::HUGEINT << 60) // greatest(max(h), 1))::BIGINT END
           |   FROM (SELECT h FROM (
           |       SELECT DISTINCT CAST('0x' || substring(md5(
           |         CAST($c AS VARCHAR)), 1, 15) AS BIGINT) AS h
           |       FROM lineitem WHERE $c IS NOT NULL)
           |     ORDER BY h LIMIT 1024)) AS n_distinct,
           |  min($c)::DOUBLE AS mn, max($c)::DOUBLE AS mx
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "join_top_customers" ->
      """SELECT c_custkey, c_name,
        |  sum(round(l_extendedprice * 100)::BIGINT *
        |      (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin,

    // DuckDB's native ASOF JOIN replays the operator exactly: the events
    // table has no (user_id, ts) collisions at any SF, so the
    // greatest-click-at-or-before pick is unique on both engines. The gate
    // runs the inner variant (null-free output — the driver compare hashes
    // values); left-join null semantics are pinned in AsofJoinSpec.
    "join_asof" ->
      """SELECT p.event_id, p.user_id,
        |  round(p.value * 100)::BIGINT AS value_cents,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    // DuckDB's ASOF with the inequality flipped = nearest following row.
    "join_asof_fwd" ->
      """SELECT p.event_id, p.user_id,
        |  round(p.value * 100)::BIGINT AS value_cents,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts""".stripMargin,

    // Same broadcast-candidate set as VALUES; QUALIFY replays the
    // deterministic (dist, candidate) argmin.
    "join_fuzzy" ->
      """WITH r(name) AS (VALUES ('src0'), ('src1'), ('src2'), ('src3'),
        |  ('src4'), ('src5'), ('src6'), ('src7'), ('src8'), ('src9')),
        |cand AS (
        |  SELECT d.doc_id, d.source, r.name,
        |    levenshtein(d.source, r.name) AS dist
        |  FROM documents d CROSS JOIN r
        |  WHERE levenshtein(d.source, r.name) <= 1)
        |SELECT doc_id, source, name AS match, dist FROM cand
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY dist, name) = 1""".stripMargin,

    "profile_topvalues" ->
      """WITH c AS (
        |  SELECT * FROM (
        |    SELECT 'lang' AS "column", lang AS value FROM documents
        |    UNION ALL
        |    SELECT 'source', source FROM documents)
        |  WHERE value IS NOT NULL)
        |SELECT "column", value, count(*) AS n,
        |  row_number() OVER (PARTITION BY "column"
        |    ORDER BY count(*) DESC, value ASC) AS rank
        |FROM c GROUP BY 1, 2
        |QUALIFY rank <= 5""".stripMargin,

    // In the exact (distinct ≤ capacity) regime MG counters equal true
    // counts, so the oracle is the exact top-10 with the same string
    // tie-break the sketch uses.
    "profile_heavy_hitters" ->
      """SELECT row_number() OVER (ORDER BY count(*) DESC,
        |         user_id::VARCHAR ASC) AS rank,
        |       user_id::VARCHAR AS value, count(*) AS est_count
        |FROM events
        |WHERE user_id IS NOT NULL
        |GROUP BY user_id
        |ORDER BY rank
        |LIMIT 10""".stripMargin,

    // Moments replayed as exact HUGEINT sums of scaled integers, then
    // rendered as VARCHAR. Only the six integer moments are gated — no
    // double-derived scalar (corr, round, floor·1e6) appears: decimal→
    // double casts of >2^53 magnitudes round differently across engines.
    // VARCHAR (not HUGEINT) because the compare layer itself widens
    // 128-bit integers to float64 where the host type system lacks
    // int128 — r5's equal-valued decimal(38,0)-vs-HUGEINT row still
    // hash-failed; strings survive every conversion identically.
    "profile_corr" ->
      Seq(("l_quantity", "l_extendedprice"), ("l_extendedprice", "l_discount"))
        .map { case (x, y) =>
          s"""SELECT '$x' AS x_col, '$y' AS y_col, count(*) AS n,
             |  sum(round($x * 100)::BIGINT)::HUGEINT::VARCHAR AS sx,
             |  sum(round($y * 100)::BIGINT)::HUGEINT::VARCHAR AS sy,
             |  sum(round($x * 100)::BIGINT::HUGEINT
             |    * round($y * 100)::BIGINT::HUGEINT)::VARCHAR AS sxy,
             |  sum(round($x * 100)::BIGINT::HUGEINT
             |    * round($x * 100)::BIGINT::HUGEINT)::VARCHAR AS sxx,
             |  sum(round($y * 100)::BIGINT::HUGEINT
             |    * round($y * 100)::BIGINT::HUGEINT)::VARCHAR AS syy
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n"),

    // Integer floor-division binning replayed exactly; prices are
    // positive so // and floor agree.
    "profile_histogram" ->
      """SELECT round(l_extendedprice * 100)::BIGINT // 500000 AS bin,
        |  round(l_extendedprice * 100)::BIGINT // 500000 * 500000 / 100.0 AS lo,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // Equi-depth edges = values at ranks floor(b*(n-1)/10) of the
    // sorted scaled column (0-based row_number; ties share a value, so
    // any rank inside a tie run reads the same edge); bucket 0 is
    // [lo, hi], b>0 is (lo, hi] — empty skew bins count 0.
    "profile_histogram_eqdepth" ->
      """WITH s AS (SELECT round(l_extendedprice * 100)::BIGINT AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |nn AS (SELECT count(*) AS n FROM s),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS rk FROM s),
        |b AS (SELECT unnest(generate_series(0, 9)) AS bucket),
        |e AS (SELECT b.bucket,
        |        (SELECT o.v FROM o, nn WHERE o.rk = (b.bucket * (nn.n - 1)) // 10) AS lo,
        |        (SELECT o.v FROM o, nn WHERE o.rk = ((b.bucket + 1) * (nn.n - 1)) // 10) AS hi
        |      FROM b)
        |SELECT e.bucket::BIGINT AS bucket, e.lo, e.hi,
        |  (SELECT count(*) FROM s
        |   WHERE (CASE WHEN e.bucket = 0 THEN s.v >= e.lo ELSE s.v > e.lo END)
        |     AND s.v <= e.hi)::BIGINT AS n
        |FROM e""".stripMargin,

    // quantile_cont shares Spark percentile's rank-(n-1)·q linear
    // interpolation; integer-cents endpoints make it bit-exact.
    "profile_quantiles" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").flatMap { c =>
        Seq(0.25, 0.5, 0.75).map { q =>
          s"""SELECT '$c' AS "column", ${q}::DOUBLE AS q,
             |  quantile_cont(round($c * 100), $q) / 100.0 AS v
             |FROM lineitem""".stripMargin
        }
      }.mkString("\nUNION ALL\n"),

    // Sketch tier, STRICT replay (r14): membership is md5-hex of
    // (l_orderkey, l_linenumber) under a threshold both engines
    // recompute from their own count(*) — same IEEE double ops
    // (Scala floor(x+0.5) ≡ DuckDB half-away-from-zero for positive x),
    // same %04x rendering, same concat_ws('|') key string. 'zzzz'
    // compares above every md5 hex char, so the n ≤ 65536 arm keeps all
    // rows in both engines. Quantiles over the survivors are the exact
    // tier's quantile_cont interpolation — no sketch term at all.
    "profile_quantiles_approx" -> {
      val sample =
        """WITH thr AS (
          |  SELECT CASE WHEN count(*) <= 65536 THEN 'zzzz'
          |    ELSE printf('%04x',
          |      least(65535, round((65536.0 / count(*)) * 65536.0))::BIGINT)
          |    END AS h
          |  FROM lineitem),
          |s AS (
          |  SELECT * FROM lineitem
          |  WHERE substring(md5(concat_ws('|',
          |    l_orderkey::VARCHAR, l_linenumber::VARCHAR)), 1, 4)
          |    < (SELECT h FROM thr))
          |""".stripMargin
      sample +
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").flatMap { c =>
          Seq(0.25, 0.5, 0.75).map { q =>
            s"""SELECT '$c' AS "column", ${q}::DOUBLE AS q,
               |  quantile_cont(round($c * 100), $q) / 100.0 AS v
               |FROM s""".stripMargin
          }
        }.mkString("\nUNION ALL\n")
    },

    "join_range" ->
      """SELECT e.event_id AS err_id, c.event_id AS click_id, e.user_id,
        |  epoch_us(c.ts) - epoch_us(e.ts) AS delta_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id
        |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 6 HOUR""".stripMargin,

    "join_multiway" ->
      """SELECT r_name, count(*) AS n_sup
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    // Q14 replay: same scaled-integer revenue, HUGEINT share quotient.
    "agg_promo_share" ->
      """SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS month,
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN round(l_extendedprice * 100)::BIGINT *
        |           (100 - round(l_discount * 100)::BIGINT)
        |      ELSE 0 END)::BIGINT AS promo_rev_e4,
        |  sum(round(l_extendedprice * 100)::BIGINT *
        |      (100 - round(l_discount * 100)::BIGINT))::BIGINT AS total_rev_e4,
        |  (sum(CASE WHEN p_type = 'PROMO'
        |       THEN round(l_extendedprice * 100)::BIGINT *
        |            (100 - round(l_discount * 100)::BIGINT)
        |       ELSE 0 END)::HUGEINT * 1000000 //
        |   sum(round(l_extendedprice * 100)::BIGINT *
        |       (100 - round(l_discount * 100)::BIGINT)))::BIGINT AS promo_share_e6
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    // TPC-H Q5 replay with the cents-exact revenue convention.
    "join_q5_shape" ->
      """SELECT n_name,
        |  sum(round(l_extendedprice * 100)::BIGINT *
        |      (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS revenue,
        |  count(*) AS n
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    // The bucketed layout changes WHERE rows live, never what they are —
    // the oracle is the plain logical join the layout co-locates.
    "join_bucketed" ->
      """SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        |FROM documents""".stripMargin,

    "window_order_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |FROM orders
        |QUALIFY rnk <= 2""".stripMargin,

    "set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders""".stripMargin,

    "layout_zorder" -> zorderOracleSql,

    // The expected diff derives from the version-2 construction rule:
    // %17 rows removed, %10 survivors changed (iff uppercasing actually
    // alters the text), %50 rows re-added under id+1e6.
    "snapshot_diff" ->
      """SELECT doc_id, 'removed' AS change FROM documents WHERE doc_id % 17 = 0
        |UNION ALL
        |SELECT doc_id, 'changed' FROM documents
        |WHERE doc_id % 17 != 0 AND doc_id % 10 = 0 AND upper(text) != text
        |UNION ALL
        |SELECT doc_id + 1000000, 'added' FROM documents WHERE doc_id % 50 = 0""".stripMargin,

    // Full integer replay of 3 PageRank rounds: rank mass in 1e9 units,
    // contrib = rank // outdeg, rank' = 0.15*scale + (85*Σin) // 100.
    // DuckDB `//` and Spark `DIV` both truncate toward zero, and every
    // intermediate is cast back to BIGINT (DuckDB sums widen to HUGEINT).
    "graph_pagerank" ->
      """WITH p AS (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM p
        |      UNION ALL SELECT b, a FROM p),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000000::BIGINT AS rank FROM n),
        |r1 AS (
        |  SELECT n.node,
        |    (150000000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
        |  FROM n LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.rank // d.deg)::BIGINT AS s
        |    FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) s ON n.node = s.node),
        |r2 AS (
        |  SELECT n.node,
        |    (150000000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
        |  FROM n LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.rank // d.deg)::BIGINT AS s
        |    FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) s ON n.node = s.node),
        |r3 AS (
        |  SELECT n.node,
        |    (150000000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
        |  FROM n LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.rank // d.deg)::BIGINT AS s
        |    FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) s ON n.node = s.node)
        |SELECT node, rank FROM r3""".stripMargin

  )

  /** DuckDB oracle for layout_zorder: the same 16-term unrolled Morton
    * interleave the Spark expression computes, generated from one place. */
  private lazy val zorderOracleSql: String = {
    val terms = (0 until 16).map(b =>
      s"(((x >> $b) & 1) << ${2 * b}) + (((y >> $b) & 1) << ${2 * b + 1})")
      .mkString("\n      + ")
    s"""WITH t AS (
       |  SELECT event_id,
       |    user_id & 65535 AS x,
       |    round(value * 100)::BIGINT & 65535 AS y
       |  FROM events)
       |SELECT event_id, ($terms)::BIGINT AS zkey FROM t""".stripMargin
  }
}
