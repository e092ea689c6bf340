package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Filters
import graft.ops.{Dedup, TextAnalysis, VectorSearch}
import graft.GateSupport._

/**
 * Embedding-math and dataset-split gates: centroids, k-means, PCA,
 * projections, coresets, and the 13 deterministic split policies.
 *
 * One gate domain of [[SparkEntry]] (assembled there); every entry
 * keeps a matching oracle in this file so a query and its DuckDB
 * replay are reviewed together.
 */
private[graft] object SparkEntryEmb {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deterministic train/val/test split (portable md5-hex buckets:
    // a pure function of the id — no sampling pass, no shuffle, stable
    // across engines and re-runs) ----
    "split_assign" -> ((s, dir) =>
      graft.ops.Splits.assign(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))),

    // ---- leakage-safe split: near-dup clusters (exact Jaccard >= 0.8
    // pair graph, same source as dedup_components) never straddle
    // train/test — the split key is the connected component ----
    "split_leakage_safe" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      graft.ops.Splits.leakageSafeAssign(d, "doc_id",
          Dedup.wordJaccardPairs(d, "text", "doc_id", 0.8),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    }),

    // ---- deterministic per-group downsampling (rebalance the corpus:
    // keep 50% of en, 25% of de, everything else whole — a pure function
    // of (id, lang): map-only, reproducible, engine-portable) ----
    "split_downsample" -> ((s, dir) =>
      graft.ops.Splits.downsample(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25))
        .select(col("doc_id"), col("lang"))),

    // ---- exact-N deterministic global sample via bounded top-k heap
    // (eval-subset carve-out: one pass, no count job, no global sort) ----
    "split_take" -> ((s, dir) =>
      graft.ops.Splits.deterministicTake(t(s, dir, "documents"), "doc_id", 100)
        .select(col("doc_id"), col("lang"))),

    // ---- temperature rebalance: output group sizes ∝ n^alpha (the
    // multilingual-LM mixing rule), as deterministic md5 keep rates
    // anchored at the smallest source ----
    "split_temperature" -> ((s, dir) =>
      graft.ops.Splits.temperatureSample(
          t(s, dir, "documents"), "doc_id", "lang", 0.5)
        .select(col("doc_id"), col("lang"))),

    // ---- embeddings: distance-to-own-centroid outlier scores (exact
    // integer numerator — see Pooling.outlierScores) ----
    "emb_outliers" -> ((s, dir) =>
      graft.ops.Pooling.outlierScores(
          t(s, dir, "embeddings"), "embedding", "label", "vec_id")
        .select(col("vec_id"), col("label"), round(col("dist"), 4).as("dist"))),

    // ---- embeddings: distributed Lloyd k-means (4 cells, 2 rounds,
    // id-ordered seeds). Integer-exact distances, first-min tie-break,
    // and truncated-mean centroid updates make the whole fit
    // SQL-replayable; each round pays one codegen'd scan + one k×dim
    // aggregate (map-side combined — same exchange volume as a count) ----
    "emb_kmeans" -> ((s, dir) =>
      graft.ops.KMeans.fitAssign(
        t(s, dir, "embeddings"), "embedding", "vec_id", 4, 2)),

    // ---- embeddings: exact covariance moments — ONE 128-bit Gram
    // aggregate over the augmented vector (1, e7) carries n, all first
    // moments, and all second moments in a count-class exchange; every
    // value is an exact integer gated as a decimal-string (the
    // profile_corr convention for >64-bit magnitudes) ----
    "emb_covariance" -> ((s, dir) =>
      graft.ops.Pca.gramMoments(t(s, dir, "embeddings"), "embedding", dim = 64)
        .select(col("i"), col("j"), col("s").cast("string").as("s"))),

    // ---- embeddings: PCA whitening apply, gated STRICTLY through its
    // defining invariance (r14 — was the census's last numeric
    // rows-only entry): the population covariance of the whitened
    // corpus must be the IDENTITY, so the gate emits that covariance
    // (upper triangle, rounded at 1e-5) and the oracle is the constant
    // identity matrix — data-independent SQL, valid at every sf. The
    // check exercises the full whitening contract end-to-end: exact
    // Gram moments → Jacobi eigenbasis (orthogonality) → λ^{-1/2}
    // scaling (unit variance) → mean centering; measured residuals are
    // ~1e-12 against the 5e-6 rounding threshold (the e7-quantized fit
    // vs raw-float apply gap is ~1e-8, still 3 orders under it).
    // Per-row whitened VALUES stay pinned in PcaSpec (driver-side
    // doubles by contract — the eigendecomposition itself is not
    // SQL-replayable, which is why the old per-row projection could
    // never be strict). round(x,5)+0.0 normalizes Spark's -0.0 on tiny
    // negative residuals to the oracle's +0.0 rendering ----
    "emb_whitened" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pcaModel(dir)(
        graft.ops.Pca.fit(t(s, dir, "embeddings"), "embedding",
          dim = 64, topK = 8))
      val k = model.components.length
      val w = emb.select(graft.ops.Pca.whiten(emb, "embedding", model).as("w"))
      val sumCols: Seq[org.apache.spark.sql.Column] =
        count(lit(1)).cast("double").as("n") +:
        ((0 until k).map(i => sum(col("w").getItem(i)).as(s"s$i")) ++
         (for { i <- 0 until k; j <- i until k }
           yield sum(col("w").getItem(i) * col("w").getItem(j))
             .as(s"p${i}_$j")))
      val one = w.agg(sumCols.head, sumCols.tail: _*)
      val cells = for { i <- 0 until k; j <- i until k } yield struct(
        lit(i.toLong).as("i"), lit(j.toLong).as("j"),
        ((col("n") * col(s"p${i}_$j") - col(s"s$i") * col(s"s$j")) /
          (col("n") * col("n"))).as("c"))
      one.select(explode(array(cells: _*)).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"),
          (round(col("e.c"), 5) + lit(0.0)).as("c"))
    }),

    // ---- embeddings: k-center greedy coreset selection (farthest-point;
    // Gonzalez 1985 / Sener & Savarese 2018) — diversity-maximizing
    // subset pass. STRICT oracle since r10: the greedy is replayed as 25
    // unrolled MATERIALIZED argmin stages (GateSupport.coresetOracle, the
    // minLabelRounds convention). The gate pins scale=1e4 on both sides
    // so the cross-multiplied cosine compares fit DuckDB's HUGEINT —
    // exactness is scale-independent (CoresetSpec pins brute-force ≡
    // local tier ≡ distributed tier at the operator's default 1e7) ----
    "emb_coreset" -> ((s, dir) =>
      graft.ops.Coreset.kCenterSelect(
        t(s, dir, "embeddings"), "embedding", "vec_id", k = 25,
        scale = 10000L)),

    // ---- embeddings: JL ±1 random projection 64→16. Signs are md5-hex
    // parity (no sampled state — the oracle recomputes them in SQL),
    // projections are exact integer sums, the whole op is map-only ----
    "emb_random_projection" -> ((s, dir) =>
      graft.ops.Projection.randomProject(
        t(s, dir, "embeddings"), "embedding", "vec_id", 16, 64)),

    // ---- exact-size per-group cap: at most 50 docs per lang, kept by
    // deterministic md5 rank via the bounded-heap aggregate (exchange
    // carries ≤ partitions × groups × 50 rows, no window sort) ----
    "split_cap_per_group" -> ((s, dir) =>
      graft.ops.Splits.capPerGroup(t(s, dir, "documents"), "doc_id", "lang", 50)
        .select(col("doc_id"), col("lang"))),

    // ---- pretraining mix: per-language TOKEN budgets, md5-prioritized
    // take-while (two-pass bucket selection — no full-group window
    // sort; fr/es absent from the budget map ⇒ dropped by contract) ----
    "split_token_budget" -> ((s, dir) =>
      graft.ops.Splits.tokenBudgetTake(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "lang", "n_tokens",
        Map("en" -> 8000L, "de" -> 2000L, "zh" -> 3000L))),

    // ---- importance-directed selection toward a target corpus (DSIR
    // spirit, integer-exact coverage score): target = every 10th doc,
    // corpus = the rest, top-100 by 2-gram coverage score_e6 — the
    // broadcast-target / probe-in-scan shape of benchmarkLeaks ----
    "split_importance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Splits.importanceTake(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", n = 100, gramN = 2)
    }),

    // ---- curriculum tiers by LM-typicality quartile: integer mean
    // milli-nats per trigram, exact order-statistic cutoffs, ties to
    // the lower tier — a pure function of the corpus ----
    "split_curriculum" -> ((s, dir) =>
      graft.ops.Splits.curriculumAssign(
        t(s, dir, "documents"), "text", "doc_id")),

    // ---- deterministic round-robin training order across sources:
    // two-pass bucket ranks, md5 within-source shuffle, integer
    // positions rank·S + source_idx ----
    "split_interleave" -> ((s, dir) =>
      graft.ops.Splits.interleaveBySource(
        t(s, dir, "documents"), "doc_id", "source")),

    // ---- quality-weighted sampling: keep probability = min(1, chars/1k) ----
    "split_weighted" -> ((s, dir) =>
      graft.ops.Splits.weightedSample(t(s, dir, "documents"), "doc_id",
          least(lit(1.0), col("n_chars").cast("double") / 1000.0))
        .select(col("doc_id"), col("n_chars"))),

    // ---- fractional epoch expansion (the up-sampling half of a mix
    // recipe): src0 ×2.5, src1 dropped, src2 ×0.5, rest ×1 ----
    "split_epochs" -> ((s, dir) =>
      graft.ops.Splits.epochExpand(t(s, dir, "documents"),
          "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.0, "src2" -> 0.5))
        .select(col("doc_id"), col("source"), col("epoch"))),

    // ---- leakage-safe temporal split: train on the past, test on the
    // future; cutoff = exact order statistic at the 80% rank ----
    "split_time_holdout" -> ((s, dir) =>
      graft.ops.Splits.timeHoldout(events(s, dir), "ts",
          testNum = 1L, testDen = 5L)
        .select(col("event_id"), col("split"))),

    // ---- embedding pooling: per-label mean vectors (class prototypes).
    // Elements scale to exact longs in-scan, the vector_sum_long aggregate
    // carries ONE fixed-size array per (partition, label) over the
    // exchange (no posexplode row blow-up), and the division back happens
    // once per output cell — deterministic under any partitioning
    // (PoolingSpec pins both the plan and the partitioning invariance) ----
    "emb_centroids" -> ((s, dir) =>
      graft.ops.Pooling.centroids(
        t(s, dir, "embeddings"), "embedding", "label"))

  )

  def oracleSql: Map[String, String] = Map(
    // Exact unrolled replay of the k-center greedy (see the gate entry's
    // comment and GateSupport.coresetOracle's scaladoc for the HUGEINT
    // scale bound).
    "emb_coreset" -> coresetOracle(k = 25, scale = 10000L),

    // Whitening's defining invariance (see the gate entry): the
    // whitened-corpus covariance rounds to the identity — a constant,
    // data-independent oracle.
    "emb_whitened" ->
      """SELECT i, j, CAST(CASE WHEN i = j THEN 1 ELSE 0 END AS DOUBLE) AS c
        |FROM range(0, 8) t1(i), range(0, 8) t2(j)
        |WHERE i <= j""".stripMargin,

    // Same recursive components as dedup_components, then the standard
    // md5 split rule applied to coalesce(component, doc_id) — whole
    // clusters land on one side.
    // Same unrolled min-label propagation + convergence poison as
    // dedup_components (the recursive walk was >900 s at sf0.1; see
    // GateSupport.minLabelRounds).
    "split_leakage_safe" -> {
      val th = graft.ops.Splits.hexThresholds(
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s"""WITH t AS MATERIALIZED (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct(toks)) AS tk FROM t),
         |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM tok a JOIN tok b ON a.tk = b.tk AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM pr
         |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
         |edges AS MATERIALIZED (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |s0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges),
         |${minLabelRounds(9)},
         |comp AS (SELECT id, label AS component FROM s9),
         |keyed AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id)::VARCHAR AS k
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id,
         |  CASE WHEN substr(md5(k), 1, 4) < '${th(0)._2}' THEN 'train'
         |       WHEN substr(md5(k), 1, 4) < '${th(1)._2}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM keyed
         |UNION ALL
         |SELECT -1, 'UNCONVERGED' WHERE EXISTS (
         |  SELECT 1 FROM s9 JOIN s8 USING (id) WHERE s9.label <> s8.label)""".stripMargin
    },

    "split_assign" -> {
      val th = graft.ops.Splits.hexThresholds(
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '${th(0)._2}' THEN 'train'
         |       WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '${th(1)._2}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    "split_downsample" -> {
      val en = graft.ops.Splits.rateHex(0.5)
      val de = graft.ops.Splits.rateHex(0.25)
      s"""SELECT doc_id, lang FROM documents
         |WHERE CASE WHEN lang = 'en' THEN substr(md5(doc_id::VARCHAR), 1, 4) < '$en'
         |           WHEN lang = 'de' THEN substr(md5(doc_id::VARCHAR), 1, 4) < '$de'
         |           ELSE TRUE END""".stripMargin
    },

    // Winner SET is order-insensitive (the gate sorts rows), so LIMIT
    // over the same md5 order is an exact oracle.
    "split_take" ->
      """SELECT doc_id, lang FROM documents
        |ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 100""".stripMargin,

    // Same deterministic md5 ranking as capPerGroup: the 15-hex-prefix
    // numeric order IS the lexicographic prefix order (lowercase hex in
    // both engines), prefix ties break by id.
    "split_cap_per_group" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY substr(md5(doc_id::VARCHAR), 1, 15), doc_id) <= 50""".stripMargin,

    "split_token_budget" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |         len(string_split(text, ' '))::BIGINT AS n_tokens,
        |         md5(doc_id::VARCHAR) AS h
        |  FROM documents
        |  WHERE lang IN ('en', 'de', 'zh')
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM w
        |)
        |SELECT doc_id, lang, n_tokens FROM c
        |WHERE cum <= CASE lang WHEN 'en' THEN 8000
        |                       WHEN 'de' THEN 2000 ELSE 3000 END""".stripMargin,

    // Same 2-gram convention as dedup_contamination (lowered whitespace
    // tokens, whole-text fallback under gramN, per-doc distinct);
    // score_e6 is integer division — both engines truncate identically
    // on non-negative operands.
    "split_importance" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
        |    END AS grams
        |  FROM t),
        |tgt AS (SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id % 10 = 0),
        |cg AS (SELECT doc_id, unnest(list_distinct(grams)) AS g
        |       FROM sh WHERE doc_id % 10 <> 0),
        |sc AS (SELECT doc_id,
        |         (1000000 * count(CASE WHEN g IN (SELECT g FROM tgt) THEN 1 END))
        |           // count(*) AS score_e6
        |       FROM cg GROUP BY 1)
        |SELECT doc_id, score_e6 FROM sc
        |ORDER BY score_e6 DESC, doc_id LIMIT 100""".stripMargin,

    // Round-robin replay: per-source md5 rank (the bucket decomposition
    // is an implementation detail — offset + in-bucket rank ≡ the
    // whole-source window), alphabetical source index, pos = rk·S+idx.
    "split_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) - 1 AS rk
        |  FROM documents),
        |s AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
        |      FROM (SELECT DISTINCT source FROM documents)),
        |n AS (SELECT count(*)::BIGINT AS ns FROM s)
        |SELECT r.doc_id, r.source,
        |       (r.rk * ns + s.sidx)::BIGINT AS train_pos
        |FROM r JOIN s USING (source), n""".stripMargin,

    // text_lm_score's trigram CTEs + integer mean score; cutoffs read
    // at exact ranks via row_number (any rank inside a tie run reads
    // the same value), tier = count of cutoffs strictly below.
    "split_curriculum" ->
      """WITH base AS (
        |  SELECT doc_id, lower(text) AS t FROM documents
        |  WHERE length(text) >= 3),
        |p AS (
        |  SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i
        |  FROM base),
        |g AS (SELECT doc_id, substr(t, i::INT, 3) AS g FROM p),
        |c AS (SELECT g, count(*) AS cnt FROM g GROUP BY g),
        |sc AS (SELECT doc_id,
        |         sum(floor(ln(cnt) * 1000)::BIGINT)::BIGINT // count(*) AS score_e3
        |       FROM g JOIN c USING (g) GROUP BY doc_id),
        |o AS (SELECT score_e3, row_number() OVER (ORDER BY score_e3) - 1 AS rk FROM sc),
        |nn AS (SELECT count(*) AS n FROM sc),
        |cut AS (SELECT
        |  (SELECT score_e3 FROM o, nn WHERE rk = (1 * (n - 1)) // 4) AS c1,
        |  (SELECT score_e3 FROM o, nn WHERE rk = (2 * (n - 1)) // 4) AS c2,
        |  (SELECT score_e3 FROM o, nn WHERE rk = (3 * (n - 1)) // 4) AS c3)
        |SELECT sc.doc_id, sc.score_e3,
        |  (CASE WHEN sc.score_e3 > cut.c1 THEN 1 ELSE 0 END +
        |   CASE WHEN sc.score_e3 > cut.c2 THEN 1 ELSE 0 END +
        |   CASE WHEN sc.score_e3 > cut.c3 THEN 1 ELSE 0 END)::BIGINT AS tier
        |FROM sc, cut""".stripMargin,

    // Same md5 4-hex remainder rule ('8000' = rateHex(0.5)); copies
    // replay as generate_series.
    "split_epochs" ->
      """SELECT doc_id, source,
        |  unnest(generate_series(0, copies - 1))::BIGINT AS epoch
        |FROM (
        |  SELECT doc_id, source,
        |    CASE source
        |      WHEN 'src0' THEN 2 + (CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4)
        |                                 < '8000' THEN 1 ELSE 0 END)
        |      WHEN 'src1' THEN 0
        |      WHEN 'src2' THEN (CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4)
        |                             < '8000' THEN 1 ELSE 0 END)
        |      ELSE 1 END AS copies
        |  FROM documents)
        |WHERE copies > 0""".stripMargin,

    // Rank replay: cutoff ts at row_number rank (n-1)*4//5; ties on
    // the cutoff value land train-side in both engines.
    "split_time_holdout" ->
      """WITH o AS (
        |  SELECT ts, row_number() OVER (ORDER BY ts) - 1 AS rk
        |  FROM events WHERE ts IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM o),
        |cut AS (SELECT ts AS c FROM o, n WHERE rk = ((n - 1) * 4) // 5)
        |SELECT event_id,
        |  CASE WHEN ts IS NULL THEN NULL
        |       WHEN ts <= (SELECT c FROM cut) THEN 'train'
        |       ELSE 'test' END AS split
        |FROM events""".stripMargin,

    "split_weighted" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT
        |  < round(least(1.0, n_chars::DOUBLE / 1000.0) * 65536)::BIGINT""".stripMargin,

    // Rates replayed from the same counts + pow expression; the md5
    // bucket compare is integer on both sides.
    "split_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS nmin FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c USING (lang) CROSS JOIN m
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 4))::BIGINT
        |      < round(pow(m.nmin::DOUBLE / c.n, 0.5) * 65536)::BIGINT""".stripMargin,

    // Full integer replay of the scaled-long distance numerator
    // (HUGEINT squares), then one sqrt + divide at the end.
    "emb_outliers" ->
      """WITH x AS (
        |  SELECT vec_id, label,
        |    unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |    round(unnest(embedding::DOUBLE[]) * 10000000)::BIGINT AS e7
        |  FROM embeddings),
        |s AS (SELECT label, pos, sum(e7)::BIGINT AS sm, count(*) AS n
        |      FROM x GROUP BY label, pos),
        |d AS (
        |  SELECT x.vec_id, x.label,
        |    sum((x.e7 * s.n - s.sm)::HUGEINT * (x.e7 * s.n - s.sm)::HUGEINT)
        |      AS num,
        |    max(s.n) AS n
        |  FROM x JOIN s USING (label, pos)
        |  GROUP BY x.vec_id, x.label)
        |SELECT vec_id, label,
        |  round(sqrt(num::DOUBLE) / (10000000.0 * n), 4) AS dist
        |FROM d""".stripMargin,

    // Parallel unnests zip values with 0-based positions; the scaled-long
    // sum replays the exact integer arithmetic of the Spark aggregate.
    "emb_centroids" ->
      """SELECT label, pos,
        |  sum(round(e * 10000000)::BIGINT) / (10000000 * count(*)) AS c
        |FROM (
        |  SELECT label,
        |    unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |    unnest(embedding::DOUBLE[]) AS e
        |  FROM embeddings)
        |GROUP BY label, pos""".stripMargin,

    // Full replay of 2 Lloyd rounds: integer distances, QUALIFY first-min
    // assignment (dist, cell) = the Spark first-minimum tie-break, and
    // truncated-mean updates (DuckDB // truncates toward zero exactly
    // like the driver's long division). Seeds = vec_ids 0..3.
    "emb_kmeans" ->
      """WITH x AS (
        |  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         round(unnest(embedding::DOUBLE[]) * 10000000)::BIGINT AS e7
        |  FROM embeddings),
        |c0 AS (SELECT vec_id::BIGINT AS cell, pos, e7 AS c FROM x WHERE vec_id < 4),
        |d1 AS (SELECT x.vec_id, c.cell,
        |         sum((x.e7 - c.c) * (x.e7 - c.c))::BIGINT AS dist
        |       FROM x JOIN c0 c USING (pos) GROUP BY x.vec_id, c.cell),
        |a1 AS (SELECT vec_id, cell FROM d1
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |-- empty-cell rule: KMeans.fit KEEPS a stale centroid when a
        |-- Lloyd round empties its cell (case None => old) — the bare
        |-- aggregate dropped the cell, so no row could be assigned to it
        |-- in later rounds (r13 gate audit); LEFT JOIN from the previous
        |-- round's centroids + coalesce replays keep-stale exactly
        |c1 AS (SELECT c0.cell, c0.pos, coalesce(m1.c, c0.c) AS c
        |       FROM c0 LEFT JOIN (
        |         SELECT a.cell, x.pos, (sum(x.e7)::BIGINT // count(*)) AS c
        |         FROM x JOIN a1 a USING (vec_id) GROUP BY a.cell, x.pos) m1
        |       ON c0.cell = m1.cell AND c0.pos = m1.pos),
        |d2 AS (SELECT x.vec_id, c.cell,
        |         sum((x.e7 - c.c) * (x.e7 - c.c))::BIGINT AS dist
        |       FROM x JOIN c1 c USING (pos) GROUP BY x.vec_id, c.cell),
        |a2 AS (SELECT vec_id, cell FROM d2
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |c2 AS (SELECT c1.cell, c1.pos, coalesce(m2.c, c1.c) AS c
        |       FROM c1 LEFT JOIN (
        |         SELECT a.cell, x.pos, (sum(x.e7)::BIGINT // count(*)) AS c
        |         FROM x JOIN a2 a USING (vec_id) GROUP BY a.cell, x.pos) m2
        |       ON c1.cell = m2.cell AND c1.pos = m2.pos),
        |d3 AS (SELECT x.vec_id, c.cell,
        |         sum((x.e7 - c.c) * (x.e7 - c.c))::BIGINT AS dist
        |       FROM x JOIN c2 c USING (pos) GROUP BY x.vec_id, c.cell),
        |a3 AS (SELECT vec_id, cell FROM d3
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1)
        |SELECT vec_id, cell FROM a3""".stripMargin,

    // Augmented-Gram replay: index 0 is the constant 1, index p >= 1 is
    // e7_{p-1}; HUGEINT products and sums, rendered as VARCHAR to match
    // the Spark side's decimal(38,0)->string (conversion-proof, the
    // profile_corr convention).
    "emb_covariance" ->
      """WITH x AS (
        |  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) + 1 AS pos,
        |         round(unnest(embedding::DOUBLE[]) * 10000000)::BIGINT AS e7
        |  FROM embeddings),
        |aug AS (SELECT vec_id, pos, e7 FROM x
        |        UNION ALL SELECT DISTINCT vec_id, 0 AS pos, 1::BIGINT FROM x)
        |SELECT a.pos::BIGINT AS i, b.pos::BIGINT AS j,
        |       sum(a.e7::HUGEINT * b.e7::HUGEINT)::VARCHAR AS s
        |FROM aug a JOIN aug b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |GROUP BY 1, 2""".stripMargin,

    // Sign matrix recomputed in SQL from the shared md5-parity rule;
    // the projection sum is exact integer arithmetic.
    "emb_random_projection" ->
      """WITH x AS (
        |  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         round(unnest(embedding::DOUBLE[]) * 10000000)::BIGINT AS e7
        |  FROM embeddings),
        |s AS (
        |  SELECT j.j, p.pos,
        |    CASE WHEN substring(md5(p.pos || '_' || j.j), 1, 1)
        |         IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT unnest(generate_series(0, 15)) AS j) j,
        |       (SELECT unnest(generate_series(0, 63)) AS pos) p)
        |SELECT x.vec_id, s.j::BIGINT AS j, sum(x.e7 * s.sgn)::BIGINT AS proj
        |FROM x JOIN s USING (pos)
        |GROUP BY x.vec_id, s.j""".stripMargin

  )
}
