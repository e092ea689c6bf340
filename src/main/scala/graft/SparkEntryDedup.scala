package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Filters
import graft.ops.{Dedup, TextAnalysis, VectorSearch}
import graft.GateSupport._

/**
 * Deduplication gates: exact/MinHash/SimHash/embedding near-dup,
 * cross-corpus, paragraph/boilerplate, decontamination, components.
 *
 * One gate domain of [[SparkEntry]] (assembled there); every entry
 * keeps a matching oracle in this file so a query and its DuckDB
 * replay are reviewed together.
 */
private[graft] object SparkEntryDedup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup: exact (hash-groupBy on content digest) ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")),

    // ---- Bloom-prefiltered exact "what's new vs the corpus": the
    // filter only routes rows to verification, so the output is exactly
    // the anti-join's — oracle-green by construction ----
    "dedup_bloom_new" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.newTextsBloom(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "text", "doc_id")
        .select(col("doc_id"))
    }),

    // ---- dedup: cross-document paragraph boilerplate counters (Dolma
    // shape) — corpus is single-line, so the entry splits paragraphs on
    // ' line ' and plants id-keyed boilerplate, mirrored in the oracle ----
    "dedup_paragraphs" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("text",
        concat(replace(col("text"), lit(" line "), lit("\n")),
          when(col("doc_id") % 3 === 0, lit("\nsubscribe to our newsletter"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("\nall rights reserved"))
            .otherwise(lit(""))))
      Dedup.paragraphDuplicates(d, "text", "doc_id")
    }),

    // ---- dedup: boilerplate REMOVAL — the transform behind the
    // dedup_paragraphs counters: rebuild each doc without the
    // paragraphs that repeat across >= 2 distinct docs (same planted
    // corpus as dedup_paragraphs) ----
    "dedup_paragraph_clean" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("text",
        concat(replace(col("text"), lit(" line "), lit("\n")),
          when(col("doc_id") % 3 === 0, lit("\nsubscribe to our newsletter"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("\nall rights reserved"))
            .otherwise(lit(""))))
      Dedup.removeDuplicateParagraphs(d, "text", "doc_id")
    }),

    // ---- dedup: exact pairwise word-set Jaccard (inverted-index join) ----
    "dedup_jaccard" -> ((s, dir) =>
      Dedup.wordJaccardPairs(t(s, dir, "documents"), "text", "doc_id", 0.8)),

    // ---- dedup: DIRECTED word-set containment |A∩B|/|A| >= 19/20 —
    // the asymmetric signal (excerpts/supersets) Jaccard misses;
    // exact integer threshold and floor score ----
    "dedup_subsets" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "text", "doc_id",
        thresholdP = 19, thresholdQ = 20)),

    // ---- dedup: exact all-pairs bag-of-words cosine (AllPairs prefix
    // filter, Bayardo et al. 2007) — integer dot/norms only, threshold
    // decided by cross-multiplication in decimal(38,0) ----
    "dedup_cosine_pairs" -> ((s, dir) =>
      Dedup.cosineCountPairs(t(s, dir, "documents"), "text", "doc_id", 0.9)),

    // ---- dedup: MinHash+LSH candidates verified by exact Jaccard ----
    // (probabilistic recall ⇒ no SQL oracle; rows-only check + unit tests)
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashDuplicates(t(s, dir, "documents"), "text", "doc_id", 0.8)),

    // ---- dedup: cross-corpus MinHash (new batch vs existing corpus —
    // the incremental-ingest primitive). Sides split by doc_id % 5; all
    // qualifying cross pairs sit at J >= 0.9 where banded detection is
    // deterministic-in-practice (1 - 3e-8 per pair), and the exact-
    // Jaccard verify makes the output the exact cross-side pair set ----
    "dedup_cross_corpus" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.minhashCrossCorpus(
        d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0),
        "text", "doc_id", 0.8)
    }),

    // ---- dedup: SimHash-prefiltered exact dups (banded 64-bit
    // signatures at hamming 0, digest-verified). Determinism: identical
    // planted texts ⇒ identical signatures ⇒ guaranteed candidates; the
    // digest check removes accidental 64-bit collisions between DIFFERENT
    // texts (the corpus has some!), so the result is exactly the
    // lowered-text dup pair set — DuckDB-expressible. The hamming>0
    // near-dup tier is pinned by DedupSpec recall tests instead. ----
    "dedup_simhash" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashExactDuplicates(planted, "text", "doc_id")
    }),

    // ---- dedup: connected components over the exact-Jaccard pair graph
    // (cluster mutual near-dups so survivorship keeps one per cluster) ----
    "dedup_components" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.wordJaccardPairs(t(s, dir, "documents"), "text", "doc_id", 0.8))),

    // ---- decontamination: n-gram overlap of a held-out slice against
    // the rest of the corpus (train/test split simulated by doc_id) ----
    "dedup_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramContamination(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", n = 8)
    }),

    // ---- dedup: benchmark leaks flagged on the TRAIN side (broadcast
    // test grams — the 100 TB-corpus direction of decontamination) ----
    "dedup_leaks" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.benchmarkLeaks(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", n = 8)
    }),

    // ---- dedup: corpus-level overlap estimate by KMV set sketches —
    // the one-pass "how much does B overlap A" gate you run BEFORE any
    // cross-corpus join (same train/test split and 8-gram convention as
    // dedup_contamination; every output an exact integer, DuckDB
    // replays sketch + union + estimates bit-for-bit) ----
    "dedup_overlap_kmv" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.corpusOverlapKmv(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", n = 8)
    }),

    // ---- dedup: the SAME overlap estimate against a STORED corpus
    // sketch (r15): the train side's 8 KiB sketch is built + persisted
    // once per dir (KmvSketchStore, the TermIndex pattern) and read
    // back through the durable parquet layout; the gate call then scans
    // only the test batch. The sketch is a pure function of the corpus,
    // so the output — and the oracle — are identical to
    // dedup_overlap_kmv; at 100 TB this halves every batch-overlap
    // check (the stored corpus is never rescanned). ----
    "dedup_overlap_kmv_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.corpusOverlapKmvStored(
        docs.filter(col("doc_id") % 10 === 0),
        "text", storedCorpusSketch(s, dir))
    }),

    // ---- dedup: embedding-cosine near-dup pairs ----
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "embedding", "vec_id", 0.4)),

    // ---- dedup: embedding near-dups via hyperplane LSH (the O(n) path) ----
    // The synthetic corpus has no true near-dups (max pairwise cos ≈ 0.51),
    // so the query plants them: every vector unioned with a 1.5×-scaled
    // copy (id + 1e6). Scaling is cosine-invariant, so each (x, x+1e6)
    // pair sits at cos = 1.0, and sign-hash signatures of v and 1.5v are
    // identical ⇒ LSH recall is exact BY CONSTRUCTION at threshold 0.8
    // (everything below ~0.51 is filtered either way). That determinism is
    // what makes a hash-match oracle — the brute-force pair scan in
    // DuckDB — attainable for a probabilistic operator.
    "dedup_embedding_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = e.unionByName(e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding")))
      Dedup.embeddingNearDupPairsLSH(
        planted, "embedding", "vec_id", threshold = 0.8, dim = 64)
    }),

    // ---- dedup: cross-corpus embedding near-dup (batch = 1.5×-scaled
    // copies of every 5th vector ⇒ planted cos=1.0 cross pairs with
    // identical sign signatures — deterministic recall, brute-force
    // cross-scan oracle; same plant argument as dedup_embedding_lsh) ----
    "dedup_embedding_cross" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val batch = e.filter(col("vec_id") % 5 === 0).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      Dedup.embeddingCrossCorpusLSH(batch, e, "embedding", "vec_id",
        threshold = 0.8, dim = 64)
    }),

    // ---- dedup: SemDeDup semantic dedup (Abbas et al. 2023) — the
    // emb_kmeans fit (4 cells, 2 Lloyd rounds) buckets the space, then
    // within-cell exact-integer cosine >= 2/5 marks any doc with a
    // tau-similar LOWER-id cell-mate as a duplicate. Clustering is the
    // candidate prune; the keep set is a pure function of the data ----
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticDedup(t(s, dir, "embeddings"), "embedding", "vec_id",
        k = 4, iterations = 2, thresholdP = 2, thresholdQ = 5)),

    // ---- substring-level duplication profile (Lee et al. 2022 signal):
    // per-doc count/fraction of distinct 8-gram spans shared with any
    // other document; grams travel as 64-bit hashes, text never shuffles. ----
    "dedup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(t(s, dir, "documents"), "text", "doc_id", n = 8))

  )

  // KMV overlap oracle, shared by the fresh-sketch and stored-sketch
  // gate entries (identical outputs by construction).
  private val overlapKmvSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+7], ' ') FOR i IN range(1, len(toks) - 6)]
        |    END AS grams
        |  FROM t),
        |ha AS (SELECT DISTINCT CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS h
        |       FROM (SELECT unnest(grams) AS g FROM sh WHERE doc_id % 10 <> 0)),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 1024),
        |hb AS (SELECT DISTINCT CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS h
        |       FROM (SELECT unnest(grams) AS g FROM sh WHERE doc_id % 10 = 0)),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 1024),
        |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
        |       ORDER BY h LIMIT 1024),
        |c AS (SELECT
        |  (SELECT count(*) FROM ka) AS m_a, (SELECT max(h) FROM ka) AS hka,
        |  (SELECT count(*) FROM kb) AS m_b, (SELECT max(h) FROM kb) AS hkb,
        |  (SELECT count(*) FROM ku) AS m_union, (SELECT max(h) FROM ku) AS hku,
        |  (SELECT count(*) FROM ku
        |   WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS n_both,
        |  (SELECT count(*) FROM ku WHERE h IN (SELECT h FROM ka)) AS n_a_in_u,
        |  (SELECT count(*) FROM ku WHERE h IN (SELECT h FROM kb)) AS n_b_in_u),
        |e AS (SELECT *,
        |  CASE WHEN m_union < 1024 THEN m_union
        |    ELSE ((1023::HUGEINT << 60) // greatest(hku, 1))::BIGINT END AS est_union
        |  FROM c)
        |SELECT m_a,
        |  CASE WHEN m_a < 1024 THEN m_a
        |    ELSE ((1023::HUGEINT << 60) // greatest(hka, 1))::BIGINT END AS est_a,
        |  m_b,
        |  CASE WHEN m_b < 1024 THEN m_b
        |    ELSE ((1023::HUGEINT << 60) // greatest(hkb, 1))::BIGINT END AS est_b,
        |  m_union, est_union, n_both,
        |  CASE WHEN m_union = 0 THEN 0
        |    ELSE (n_both::HUGEINT * est_union // m_union)::BIGINT END AS est_inter,
        |  CASE WHEN m_union = 0 THEN 0
        |    ELSE (n_both::HUGEINT * 1000000 // m_union)::BIGINT END AS jaccard_e6,
        |  CASE WHEN n_a_in_u = 0 THEN 0
        |    ELSE (n_both::HUGEINT * 1000000 // n_a_in_u)::BIGINT END AS cont_a_in_b_e6,
        |  CASE WHEN n_b_in_u = 0 THEN 0
        |    ELSE (n_both::HUGEINT * 1000000 // n_b_in_u)::BIGINT END AS cont_b_in_a_e6
        |FROM e""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,

    // The Bloom stage is invisible to semantics: result = exact
    // anti-join of the batch's texts against the corpus's.
    "dedup_bloom_new" ->
      """SELECT b.doc_id FROM documents b
        |WHERE b.doc_id % 10 = 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents c
        |    WHERE c.doc_id % 10 <> 0 AND c.text = b.text)""".stripMargin,

    "dedup_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
        |  FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8""".stripMargin,

    // Directed containment over the same distinct-token sets as
    // dedup_jaccard; integer threshold and integer-division score.
    "dedup_subsets" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
        |  FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, (inter * 1000000) // sa.n AS containment_e6
        |FROM pairs JOIN sz sa ON sa.doc_id = id_a
        |WHERE inter * 20 >= 19 * sa.n""".stripMargin,

    // Boilerplate removal: same planted corpus and >=2-distinct-docs
    // rule as dedup_paragraphs; DuckDB filters by paragraph TEXT where
    // Spark drops by digest-matched positions — identical semantics.
    // coalesce('') on the rebuilt text: a doc whose EVERY paragraph is
    // boilerplate keeps an empty text (the doc survives the transform;
    // dropping rows is the caller's policy) — Spark's array_join of an
    // empty array is '', but DuckDB's array_to_string of an empty list
    // is NULL. First materialized at sf0.1 (r9 census).
    "dedup_paragraph_clean" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    replace(text, ' line ', chr(10))
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN chr(10) || 'subscribe to our newsletter' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN chr(10) || 'all rights reserved' ELSE '' END AS text
        |  FROM documents),
        |dup AS (SELECT para FROM
        |          (SELECT doc_id, unnest(string_split(text, chr(10))) AS para FROM d)
        |        GROUP BY para HAVING count(DISTINCT doc_id) >= 2),
        |dl AS (SELECT coalesce(list(para), []) AS l FROM dup)
        |SELECT d.doc_id,
        |  coalesce(array_to_string(
        |    list_filter(string_split(d.text, chr(10)),
        |                x -> NOT list_contains(dl.l, x)), chr(10)), '') AS text,
        |  len(list_filter(string_split(d.text, chr(10)),
        |                  x -> NOT list_contains(dl.l, x)))::BIGINT AS n_kept,
        |  (len(string_split(d.text, chr(10))) -
        |   len(list_filter(string_split(d.text, chr(10)),
        |                   x -> NOT list_contains(dl.l, x))))::BIGINT AS n_removed
        |FROM d, dl""".stripMargin,

    // Paragraph dedup: duplicate = verbatim paragraph in >=2 distinct
    // docs; DuckDB groups by paragraph TEXT where Spark groups by md5
    // digest — identical partition of the key space.
    "dedup_paragraphs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    replace(text, ' line ', chr(10))
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN chr(10) || 'subscribe to our newsletter' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN chr(10) || 'all rights reserved' ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS para FROM d),
        |dup AS (SELECT para FROM p GROUP BY para
        |        HAVING count(DISTINCT doc_id) >= 2)
        |SELECT p.doc_id,
        |  count(*)::BIGINT AS n_paragraphs,
        |  sum(CASE WHEN dup.para IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dup_paragraphs,
        |  sum(CASE WHEN dup.para IS NOT NULL THEN length(p.para) ELSE 0 END)::BIGINT
        |    AS dup_chars,
        |  sum(length(p.para))::BIGINT AS paragraph_chars
        |FROM p LEFT JOIN dup ON dup.para = p.para
        |GROUP BY p.doc_id""".stripMargin,

    // Brute-force ground truth for the AllPairs prefix-filtered join:
    // the filter is provably lossless (Cauchy–Schwarz suffix bound), so
    // the outputs must be identical. Threshold 0.9 = 900000/1e6 exact
    // rational, decided in HUGEINT — mirrors Spark's decimal(38,0).
    "dedup_cosine_pairs" ->
      """WITH tf AS (
        |  SELECT doc, tok, count(*)::BIGINT AS tf FROM (
        |    SELECT doc_id AS doc, unnest(string_split(lower(text), ' ')) AS tok
        |    FROM documents) GROUP BY doc, tok),
        |norm AS (SELECT doc, sum(tf * tf)::BIGINT AS n2 FROM tf GROUP BY doc),
        |dot AS (
        |  SELECT a.doc AS id_a, b.doc AS id_b, sum(a.tf * b.tf)::BIGINT AS dot
        |  FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc < b.doc
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, dot, na.n2 AS na2, nb.n2 AS nb2
        |FROM dot
        |JOIN norm na ON na.doc = id_a
        |JOIN norm nb ON nb.doc = id_b
        |WHERE 1000000::HUGEINT * 1000000 * dot * dot
        |      >= 900000::HUGEINT * 900000 * na.n2 * nb.n2""".stripMargin,

    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4""".stripMargin,

    // Full SemDeDup replay: the emb_kmeans Lloyd CTEs produce the final
    // assignment a3, then within-cell pairs are decided by the exact
    // integer test dot > 0 AND q^2*dot^2 >= p^2*na2*nb2 in HUGEINT
    // (q=5, p=2 - the same sign-aware comparison the dense_cos_ge
    // kernel makes; no doubles anywhere in the hashed projection).
    "dedup_semantic" ->
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
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |n2 AS (SELECT vec_id, sum(e7 * e7)::BIGINT AS n2 FROM x GROUP BY vec_id),
        |pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |         sum(xa.e7 * xb.e7)::BIGINT AS dot
        |       FROM a3 a JOIN a3 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |       JOIN x xa ON xa.vec_id = a.vec_id
        |       JOIN x xb ON xb.vec_id = b.vec_id AND xb.pos = xa.pos
        |       GROUP BY 1, 2),
        |dup AS (SELECT DISTINCT pd.ib AS vec_id
        |        FROM pd
        |        JOIN n2 na ON na.vec_id = pd.ia
        |        JOIN n2 nb ON nb.vec_id = pd.ib
        |        WHERE pd.dot > 0
        |          AND 25::HUGEINT * pd.dot * pd.dot >= 4::HUGEINT * na.n2 * nb.n2)
        |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
        |FROM a3 a LEFT JOIN dup d USING (vec_id)""".stripMargin,

    "dedup_contamination" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+7], ' ') FOR i IN range(1, len(toks) - 6)]
        |    END AS grams
        |  FROM t),
        |train AS (
        |  SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id % 10 <> 0),
        |test_g AS (
        |  SELECT doc_id AS test_id, unnest(list_distinct(grams)) AS g
        |  FROM sh WHERE doc_id % 10 = 0),
        |tot AS (SELECT test_id, count(*) AS n_grams FROM test_g GROUP BY 1),
        |hit AS (SELECT test_id, count(*) AS n_hits
        |        FROM test_g WHERE g IN (SELECT g FROM train) GROUP BY 1)
        |SELECT test_id, n_grams,
        |  round(coalesce(n_hits, 0) * 1.0 / n_grams, 4) AS contamination
        |FROM tot LEFT JOIN hit USING (test_id)""".stripMargin,

    // KMV overlap replay: same 8-token gram convention as
    // dedup_contamination, the same md5-prefix hash and bottom-1024 as
    // the profile_stats_approx oracle, then union re-trim + membership
    // counts + HUGEINT estimates — integer arithmetic end to end.
    "dedup_overlap_kmv" -> overlapKmvSql,

    // the stored-sketch path replays against the SAME SQL: the persisted
    // corpus-side sketch is a pure function of the corpus, so sketching
    // both sides fresh and reading one side from disk are bit-identical
    "dedup_overlap_kmv_stored" -> overlapKmvSql,

    // Mirror of dedup_contamination with the per-doc score on the TRAIN
    // side (benchmark-leak direction); same 8-token gram convention.
    "dedup_leaks" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+7], ' ') FOR i IN range(1, len(toks) - 6)]
        |    END AS grams
        |  FROM t),
        |test_g AS (
        |  SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id % 10 = 0),
        |train_g AS (
        |  SELECT doc_id AS train_id, unnest(list_distinct(grams)) AS g
        |  FROM sh WHERE doc_id % 10 <> 0),
        |tot AS (SELECT train_id, count(*) AS n_grams FROM train_g GROUP BY 1),
        |hit AS (SELECT train_id, count(*) AS n_hits
        |        FROM train_g WHERE g IN (SELECT g FROM test_g) GROUP BY 1)
        |SELECT train_id, n_grams, coalesce(n_hits, 0) AS n_hits,
        |  round(coalesce(n_hits, 0) * 1.0 / n_grams, 4) AS leak_frac
        |FROM tot LEFT JOIN hit USING (train_id)""".stripMargin,

    // Connected components via UNROLLED min-label propagation (9 rounds
    // = diameter bound 8 + one confirmation round, see
    // GateSupport.minLabelRounds): min per vertex over its component
    // = the DataFrame fixpoint's result. The earlier recursive-CTE walk
    // accumulated every (node, reachable-label) pair — quadratic on the
    // near-clique dup clusters and >900 s at sf0.1; the unrolled rounds
    // keep one row per node and replay in ~40 s. The final UNION ALL
    // poison row fires iff round 9 still changed labels (diameter > 8),
    // turning non-convergence into a loud hash mismatch.
    "dedup_components" ->
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
         |${minLabelRounds(9)}
         |SELECT id, label AS component FROM s9
         |UNION ALL
         |SELECT -1, -1 WHERE EXISTS (
         |  SELECT 1 FROM s9 JOIN s8 USING (id) WHERE s9.label <> s8.label)""".stripMargin,

    // MinHash+LSH verified by exact shingle Jaccard: all qualifying pairs
    // in this corpus sit at J >= 0.9, where 16-band/4-row detection
    // probability is 1 - 3e-8 per pair and signatures are seed-fixed, so
    // the probabilistic op is deterministically exact here and the
    // ground-truth inverted-index Jaccard is a valid hash-match oracle.
    // Inverted-index join (docs paired only through a SHARED shingle,
    // like dedup_jaccard's token shape), not all-pairs list_intersect:
    // 12.5M pairwise list intersects exceeded 900 s at sf0.1; this
    // replay is ~2 s and algebraically identical (a pair with zero
    // shared shingles cannot reach J >= 0.8, and
    // union = n_a + n_b - inter over the same distinct shingle sets).
    "dedup_minhash" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END AS shingles
        |  FROM t),
        |ds AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh),
        |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        |FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8""".stripMargin,

    // Cross-side exact Jaccard ≥ 0.8 (all qualifying pairs in this corpus
    // are at J ≥ 0.9 — deterministic banded recall, same argument as
    // dedup_minhash above).
    // Same inverted-index shape as dedup_minhash above (the batch/corpus
    // partition predicates move onto the shingle join unchanged).
    "dedup_cross_corpus" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END AS shingles
        |  FROM t),
        |ds AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh),
        |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS inter
        |  FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id % 5 = 0 AND b.doc_id % 5 != 0
        |  GROUP BY 1, 2)
        |SELECT batch_id, corpus_id,
        |  round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        |FROM pairs JOIN sz sa ON sa.doc_id = batch_id JOIN sz sb ON sb.doc_id = corpus_id
        |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8""".stripMargin,

    // SimHash at hamming 0 + digest verify = exactly the pairs with equal
    // lowered text over the planted union (recall guaranteed by identical
    // signatures; precision by the digest check).
    "dedup_simhash" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM u a JOIN u b ON a.doc_id < b.doc_id AND lower(a.text) = lower(b.text)""".stripMargin,

    "dedup_embedding_lsh" ->
      """WITH u AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(embedding, x -> x * 1.5::FLOAT)
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        |FROM u a JOIN u b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.8""".stripMargin,

    // Brute-force cross-side cosine scan over the planted batch.
    "dedup_embedding_cross" ->
      """WITH b AS (
        |  SELECT vec_id + 1000000 AS batch_id,
        |         list_transform(embedding, x -> x * 1.5::FLOAT) AS v
        |  FROM embeddings WHERE vec_id % 5 = 0)
        |SELECT b.batch_id, e.vec_id AS corpus_id,
        |  round(list_cosine_similarity(b.v::DOUBLE[], e.embedding::DOUBLE[]), 4) AS cos
        |FROM b, embeddings e
        |WHERE list_cosine_similarity(b.v::DOUBLE[], e.embedding::DOUBLE[]) >= 0.8""".stripMargin,

    // Same gram convention as dedup_contamination: 8-token windows,
    // whole-token-stream gram for short docs, DISTINCT grams per doc.
    "dedup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+7], ' ') FOR i IN range(1, len(toks) - 6)]
        |    END AS grams
        |  FROM t),
        |dg AS (SELECT doc_id, unnest(list_distinct(grams)) AS g FROM sh),
        |shared AS (SELECT g FROM dg GROUP BY g HAVING count(*) >= 2),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY 1),
        |hit AS (SELECT doc_id, count(*) AS n_shared
        |        FROM dg WHERE g IN (SELECT g FROM shared) GROUP BY 1)
        |SELECT doc_id, n_grams, coalesce(n_shared, 0) AS n_shared,
        |  round(coalesce(n_shared, 0) * 1.0 / n_grams, 4) AS shared_frac
        |FROM tot LEFT JOIN hit USING (doc_id)""".stripMargin
  )
}
