package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 keyword scoring and hybrid (keyword + vector) rank fusion — the
 * lexical half of a retrieval stack. The reference is vector-only
 * (`/root/reference/query.go:165-245` scores cosine exclusively); a
 * training-data / RAG pipeline additionally needs term-based retrieval
 * and a fusion step, so these are first-class here.
 *
 * Scale shape (the reason this is NOT an explode-and-join design): the
 * query's term set is a small literal list, so per-term term frequencies
 * are computed IN-SCAN with `size(filter(tokens, _ === term))` — a
 * map-only projection inside whole-stage codegen. The corpus statistics
 * BM25 needs (N, avgdl, df per query term) reduce in ONE map-side-combined
 * scalar aggregate. Total cost at 100 TB: two corpus scans and a bounded
 * top-k (TakeOrderedAndProject) — zero wide shuffles, no inverted index
 * materialization, nothing proportional to vocabulary size.
 */
object KeywordSearch {

  /** Corpus-level BM25 statistics for a fixed query-term list. */
  final case class Bm25Stats(nDocs: Long, avgDl: Double, docFreq: Map[String, Long])

  // The ONE tokenization convention (shared with Dedup and TermIndex):
  // the scan/index bit-identity guarantee and the shared oracle depend
  // on all three using the same function.
  private def toks(textCol: Column): Column = Dedup.tokens(textCol)

  /** One scalar aggregate over the corpus: document count, total token
    * count (for avgdl), and per-query-term document frequency. */
  def corpusStats(df: DataFrame, textCol: String, terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty, "need at least one query term")
    val t = toks(col(textCol))
    val aggs =
      count(lit(1)).as("__n") +: sum(size(t)).cast("long").as("__tok") +:
        terms.zipWithIndex.map { case (term, i) =>
          sum(when(array_contains(t, term), 1L).otherwise(0L)).as(s"__df$i")
        }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    // Over zero rows sum() is NULL (getLong would NPE) and avgdl is 0/0 —
    // fail with the actual problem instead.
    require(n > 0, "BM25 corpus stats are undefined on an empty corpus")
    Bm25Stats(
      nDocs = n,
      avgDl = r.getLong(1).toDouble / n,
      docFreq = terms.zipWithIndex.map { case (term, i) => term -> r.getLong(2 + i) }.toMap)
  }

  /** Okapi idf with the standard +1 floor (never negative):
    * ln(1 + (N − df + 0.5) / (df + 0.5)). StrictMath.log, not Math.log:
    * Spark's SQL `log()` lowers to StrictMath in both the interpreted and
    * codegen paths, and TermIndexState.topK computes this same idf with
    * SQL `log()` — the scan/index bit-identity contract needs the driver
    * constant to come from the identical libm. */
  def idf(nDocs: Long, df: Long): Double =
    StrictMath.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  /**
   * BM25 score column for `terms`, given precomputed corpus stats. The
   * per-term contributions are added in FIXED term order (no aggregation
   * reorder), so the floating-point result is deterministic and
   * replayable by an external engine.
   */
  def bm25Score(
      textCol: Column,
      terms: Seq[String],
      stats: Bm25Stats,
      k1: Double = 1.2,
      b: Double = 0.75): Column = {
    val t = toks(textCol)
    val dl = size(t).cast("double")
    terms.map { term =>
      val tf = size(filter(t, w => w === term)).cast("double")
      // idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) — parenthesized
      // exactly like the SQL oracle so IEEE evaluation order matches.
      lit(idf(stats.nDocs, stats.docFreq(term))) *
        (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(stats.avgDl)))
    }.reduceLeft(_ + _)
  }

  /** Top-k documents by BM25 for a bag of query terms. Returns
    * (idCol, score) with score > 0 (the doc shares ≥ 1 term with the
    * query); bounded top-k, deterministic id tie-break. */
  def bm25TopK(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      precomputedStats: Option[Bm25Stats] = None): DataFrame = {
    require(k > 0, "k must be > 0")
    // Corpus stats are index metadata: a repeated-query deployment computes
    // them once (or reads them from TermIndex meta) — pass them in to
    // drop the stats aggregate from the per-query cost.
    val stats = precomputedStats.getOrElse(corpusStats(df, textCol, terms))
    require(terms.forall(stats.docFreq.contains),
      "precomputed stats must cover every query term")
    df.withColumn("score", bm25Score(col(textCol), terms, stats, k1, b))
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /**
   * Reciprocal-rank fusion (Cormack et al., SIGIR'09): fused(d) =
   * Σ_r 1/(rrfK + rank_r(d)) over the rankings that contain d. Each input
   * must carry (idCol, rank ∈ 1..n); missing entries contribute 0. The
   * inputs are top-k lists (small), so the outer joins broadcast — the
   * fusion step never reshuffles the corpus.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val parts = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), (lit(1.0) / (lit(rrfK.toDouble) + col("rank").cast("double")))
        .as(s"__c$i"))
    }
    val joined = parts.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = parts.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    joined.select(col(idCol), score.as("rrf"))
  }

  /** Attach a dense 1-based `rank` by (scoreCol desc, idCol asc). Meant
    * for ALREADY-REDUCED top-k frames (a handful of rows): the window has
    * a single partition by design, never use it on a corpus-sized input. */
  def ranked(topk: DataFrame, scoreCol: String, idCol: String): DataFrame =
    topk.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc(scoreCol), asc(idCol))))

  /**
   * Hybrid retrieval: BM25 top-`fetchK` fused with vector-cosine
   * top-`fetchK` by RRF, returning the fused top-`k`. `docs` and
   * `vectors` join on `idCol` (the corpus/embedding id spaces coincide).
   */
  def hybridTopK(
      docs: DataFrame,
      textCol: String,
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      terms: Seq[String],
      queryVec: Array[Float],
      k: Int,
      fetchK: Int = 50,
      rrfK: Int = 60,
      k1: Double = 1.2,
      b: Double = 0.75,
      precomputedStats: Option[Bm25Stats] = None): DataFrame = {
    require(k > 0 && fetchK >= k, "need fetchK >= k > 0")
    val lexical = ranked(
      bm25TopK(docs, textCol, idCol, terms, fetchK, k1, b, precomputedStats),
      "score", idCol)
    val semantic = ranked(
      VectorSearch.topK(vectors, vecCol, queryVec, fetchK, idCol, precision = "f64")
        .select(col(idCol), col("similarity")),
      "similarity", idCol)
    rrfFuse(Seq(lexical, semantic), idCol, rrfK)
      .orderBy(desc("rrf"), asc(idCol))
      .limit(k)
  }
}
