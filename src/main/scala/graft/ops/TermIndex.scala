package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Durable inverted index for BM25 — the repeated-query tier of
 * [[KeywordSearch]]. The scan-based `bm25TopK` pays one corpus pass per
 * query; a deployment answering many keyword queries builds this index
 * once and each probe reads ONLY the posting lists of its terms.
 *
 * Layout (classic search-engine posting design, denormalized so a probe
 * needs no corpus-sized join):
 *
 *  - `postings/` — one row per (token, doc): `(tbkt, token, doc, tf, dl,
 *    df)`, written `partitionBy(tbkt)` where `tbkt` is the first byte of
 *    md5(token). A probe filters `tbkt IN (buckets of its terms)`, which
 *    Spark turns into PARTITION PRUNING: at 100 TB the scan touches
 *    ~|terms|/256 of the files. Doc length (`dl`) and document frequency
 *    (`df`) ride inside the posting row, so scoring is a pure projection.
 *  - `meta/` — one row: corpus size `n_docs`, `avg_dl`.
 *
 * Probe cost is Σ df(term) rows — independent of corpus size — followed
 * by a bounded top-k. Scores are computed with the exact arithmetic of
 * `KeywordSearch.bm25Score` (per-term sums touch ≤ 1 posting per doc, so
 * there is no accumulation-order sensitivity), and the two paths return
 * bit-identical results.
 */
object TermIndex {

  /** Partition key: first md5 hex byte of the token → 256 buckets.
    * md5 (not xxhash64) so the driver can compute a term's bucket
    * without a Spark job and external engines can replay it. */
  private[graft] def bucketCol(token: org.apache.spark.sql.Column) =
    conv(substring(md5(token), 1, 2), 16, 10).cast("int")

  private[graft] def bucketOf(term: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    java.lang.Byte.toUnsignedInt(d(0))
  }

  /**
   * Build and persist the index. One explode + one (doc, token)
   * aggregate + one token aggregate (for df) + a co-partitioned join to
   * denormalize — all keyed on the token, so the shuffle carries
   * (token, doc, counts) rows, never the text.
   */
  def build(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      path: String): TermIndexState = {
    val spark = docs.sparkSession
    // Dedup.tokens = the shared tokenization convention; the bit-identity
    // with KeywordSearch.bm25TopK depends on using the same function.
    // Tokenize ONCE into a column and derive explode+dl from it — inlining
    // the call twice would pay the split/lower work twice per row on the
    // expensive pass of the whole build.
    val toks = docs
      .select(col(idCol).as("doc"), Dedup.tokens(col(textCol)).as("__t"))
      .select(col("doc"), explode(col("__t")).as("token"),
        size(col("__t")).cast("long").as("dl"))
    val tf = toks.groupBy("token", "doc")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val postings = tf.join(df, Seq("token")) // both sides already hashed on token
      .select(bucketCol(col("token")).as("tbkt"),
        col("token"), col("doc"), col("tf"), col("dl"), col("df"))
    postings.write.mode("overwrite").partitionBy("tbkt").parquet(s"$path/postings")
    // Dedup.tokens here too: today size(split(text," ")) happens to
    // agree (lowering preserves token count), but avg_dl and the
    // per-posting dl must stay bound to the ONE tokenization convention
    // or any future tokens() change silently skews BM25 scores
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(graft.ops.Dedup.tokens(col(textCol)))).cast("long")
        .as("total_tokens")).head()
    val n = stats.getLong(0)
    // Over zero rows sum() is NULL (getLong(1) would NPE) and a 0-doc
    // meta row would persist avg_dl = NaN, poisoning every later topK —
    // refuse to build instead.
    require(n > 0, "cannot build a term index over an empty corpus")
    val tot = stats.getLong(1)
    import spark.implicits._
    Seq((n, tot.toDouble / n, idCol))
      .toDF("n_docs", "avg_dl", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    load(spark, path)
  }

  /** Re-open a layout written by [[build]]. */
  def load(spark: SparkSession, path: String): TermIndexState = {
    val meta = spark.read.parquet(s"$path/meta").head()
    new TermIndexState(spark.read.parquet(s"$path/postings"),
      meta.getLong(0), meta.getDouble(1), meta.getString(2))
  }
}

/** Re-opened inverted index (see [[TermIndex.build]]). */
final class TermIndexState private[ops] (
    val postings: DataFrame,
    val nDocs: Long,
    val avgDl: Double,
    idCol: String) {

  /**
   * BM25 top-k over the index: a bucket-pruned posting scan (partition
   * pruning on `tbkt`, then a row filter on the term), per-term
   * contributions pivoted into fixed-order addition (each per-term sum
   * aggregates ≤ 1 posting per doc — no float reorder), bounded top-k.
   * Bit-identical to `KeywordSearch.bm25TopK` over the same corpus.
   */
  def topK(
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0, "need terms and k > 0")
    val buckets = terms.map(TermIndex.bucketOf).distinct
    val hits = postings
      .filter(col("tbkt").isin(buckets: _*))   // partition pruning
      .filter(col("token").isin(terms: _*))    // row filter within buckets
    // idf from the posting's own df — log arguments built in the same
    // (long − long) + 0.5 order as KeywordSearch.idf
    def contrib(tfc: org.apache.spark.sql.Column, dfc: org.apache.spark.sql.Column,
        dlc: org.apache.spark.sql.Column) = {
      val tf = tfc.cast("double")
      log(lit(1.0) + (lit(nDocs) - dfc + lit(0.5)) / (dfc + lit(0.5))) *
        (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dlc.cast("double") / lit(avgDl)))
    }
    val perTerm = terms.zipWithIndex.map { case (term, i) =>
      sum(when(col("token") === term,
        contrib(col("tf"), col("df"), col("dl")))).as(s"__s$i")
    }
    val score = terms.indices.map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    hits.groupBy(col("doc").as(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score", score)
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
