package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed (hash-clustered) corpus layout: the join-locality tier of the
 * persistence story.
 *
 * Every dedup / search / maintenance flow ends in an id equi-join back to
 * the corpus — candidate pairs re-attach vectors, survivors semi-join the
 * winner set, batched getByID probes the id column. On a plain parquet
 * layout each of those joins shuffles the FULL corpus by id — at 100 TB
 * that is the single largest exchange in the pipeline, repeated per job.
 * Writing the corpus once as a bucketed table (`bucketBy(n, id)`, Spark's
 * hive-style hash bucketing) pins every row's bucket at write time, so any
 * join or aggregate keyed on `id` between co-bucketed tables plans with
 * ZERO Exchange on either side (pinned in BucketedCorpusSpec): the shuffle
 * is paid once at layout time, then amortized over every downstream job.
 *
 * `sortBy(id)` within buckets additionally lets sort-merge joins skip the
 * per-task sort when bucket files are single-sorted (one file per bucket).
 *
 * Bucketed metadata lives in the session catalog, not the parquet footers,
 * so a fresh session re-attaches with `register` — a metadata-only DDL
 * over the existing files (no data rewrite). This mirrors how a long-lived
 * warehouse deployment would declare the layout in its catalog.
 */
object BucketedCorpus {

  /** Write `df` as a bucketed external parquet table at `dir`. The write
    * shuffles by `key` once (`repartition` keeps one file per bucket —
    * without it every input task emits a file per bucket, and tiny files
    * defeat both the scan and the sorted-bucket fast path). */
  def save(
      df: DataFrame,
      table: String,
      dir: String,
      buckets: Int,
      key: String): Unit = {
    df.repartition(buckets, df(key))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", dir)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Re-attach an existing bucketed layout in a fresh session: issues the
    * CREATE TABLE ... CLUSTERED BY DDL over the files already at `dir`.
    * Reads parquet FOOTERS once for the schema (cheap, bounded by file
    * count); no data pages are read and nothing is rewritten. */
  def register(
      spark: SparkSession,
      table: String,
      dir: String,
      buckets: Int,
      key: String): Unit = {
    val schema = spark.read.parquet(dir).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schema) USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
         |LOCATION '$dir'""".stripMargin)
  }
}
