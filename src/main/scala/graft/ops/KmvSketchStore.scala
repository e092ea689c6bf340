package graft.ops

import org.apache.spark.sql.SparkSession

/**
 * Durable storage for a corpus-level KMV n-gram sketch — the stored
 * half of [[Dedup.corpusOverlapKmv]].
 *
 * Why it exists (r15): the overlap estimator needs one bottom-k sketch
 * PER SIDE, and the common production question is "does this NEW crawl
 * batch overlap my STORED corpus?" — asked for every batch against the
 * same corpus. The corpus-side sketch is a pure function of the corpus
 * (the k smallest md5 hashes of its distinct n-grams, 8 KiB at
 * k = 1024), so it is computed once at ingest and persisted here the
 * way [[TermIndex]] persists postings; each incoming batch then pays
 * ONE scan of ITSELF and a driver-side combine of two ≤ k-long arrays.
 * At 100 TB the stored corpus is never rescanned.
 *
 * Layout: a single-row parquet frame (k, shingle_n, sorted hash array)
 * at `path` — trivially small, schema-checked on read, engine-neutral
 * (any parquet reader can replay the estimators from it). Writes go
 * through Spark's committed-overwrite, so a torn write never exposes a
 * partial sketch.
 */
object KmvSketchStore {

  /** A stored corpus sketch: the k smallest 60-bit md5 hashes of the
    * corpus's distinct word-`shingleN`-grams (sorted ascending), plus
    * the parameters a comparison side must match. `hashes.length < k`
    * means the corpus had fewer than k distinct grams — the sketch IS
    * the gram set's hash image. */
  final case class CorpusKmvSketch(hashes: Array[Long], k: Int, shingleN: Int) {
    require(k >= 2, s"k must be >= 2, got $k")
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    require(hashes.length <= k,
      s"sketch holds ${hashes.length} hashes but k = $k")
  }

  /** Sketch `df` and persist the result at `path` (overwrite). */
  def build(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      path: String,
      shingleN: Int = 8,
      k: Int = 1024): CorpusKmvSketch = {
    val s = CorpusKmvSketch(
      Dedup.corpusSketchKmv(df, textCol, shingleN, k), k, shingleN)
    write(df.sparkSession, path, s)
    s
  }

  def write(spark: SparkSession, path: String, s: CorpusKmvSketch): Unit = {
    import spark.implicits._
    Seq((s.k, s.shingleN, s.hashes.toSeq))
      .toDF("k", "shingle_n", "hashes")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): CorpusKmvSketch = {
    val rows = spark.read.parquet(path)
      .selectExpr("k", "shingle_n", "hashes").collect()
    require(rows.length == 1,
      s"KMV sketch at $path holds ${rows.length} rows, expected exactly 1")
    val r = rows.head
    CorpusKmvSketch(r.getSeq[Long](2).toArray, r.getInt(0), r.getInt(1))
  }
}
