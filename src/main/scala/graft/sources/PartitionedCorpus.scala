package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, element_at, lit}

/**
 * Hive-partitioned corpus layout: the scan-pruning tier of the
 * persistence story, complementing [[BucketedCorpus]] (join locality).
 *
 * Slicing predicates — language, source, date, license, quality tier —
 * dominate selective corpus reads: "train on the English web slice",
 * "re-score yesterday's crawl". On a flat layout those are full scans
 * that a row-group filter may or may not skip; partitioning by the
 * slice column turns them into FILE-LISTING decisions: the scan's
 * `PartitionFilters` eliminate whole directories before a single byte
 * of parquet is opened (pinned in PartitionedCorpusSpec). At 100 TB
 * with ~hundreds of slices this is the difference between touching
 * 1/100th of the corpus and touching all of it.
 *
 * Chromem-parity tie-in: collection metadata is a string→string MAP
 * (no top-level columns), so [[saveByMetadata]] derives a partition
 * column from a metadata key with the SAME missing-key⇒"" coalescing
 * the query path uses (`Filters`, reference query.go:136-140) —
 * a metadata-equality `where` on the partition key then prunes
 * directories instead of scanning the collection.
 *
 * Cardinality caveat (the standard partitioning trade-off): partition
 * columns must be low-cardinality (≲10⁴ distinct values); a
 * high-cardinality key produces one directory per value and the
 * small-files problem. Ids belong in [[BucketedCorpus]], not here.
 */
object PartitionedCorpus {

  /** Write `df` partitioned by existing low-cardinality columns. */
  def save(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "at least one partition column")
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }

  /** Partition-column name derived from a metadata key. */
  def metaCol(key: String): String = s"__p_$key"

  /** Write a metadata-map frame (collection schema) partitioned by a
    * derived `__p_<key>` column; missing keys land in the "" partition
    * (same coalescing as the query path, so filter semantics agree). */
  def saveByMetadata(
      df: DataFrame,
      dir: String,
      metadataCol: String,
      key: String): Unit =
    save(
      df.withColumn(metaCol(key),
        coalesce(element_at(col(metadataCol), lit(key)), lit(""))),
      dir, Seq(metaCol(key)))

  /** Open a partitioned layout; partition columns come back as ordinary
    * columns and equality filters on them prune at file-listing time.
    *
    * Derived `__p_*` metadata partition columns are forced back to
    * STRING via an explicit schema: Spark's partition-column type
    * inference (on by default) would otherwise coerce numeric/date-
    * shaped metadata values — "01" reads back as int 1, "1.10" as 1.1 —
    * and `metaFilter("version", "01")` would compare "1" === "01" and
    * silently return ZERO rows, breaking the documented string-equality
    * parity with `Filters.whereClause`. With a user schema the raw
    * directory value is kept as the string it was written as.
    * User-managed partition columns from [[save]] keep their inferred
    * types (callers filter them with typed predicates). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val inferred = spark.read.parquet(dir).schema
    if (!inferred.exists(_.name.startsWith("__p_"))) spark.read.parquet(dir)
    else {
      val fixed = org.apache.spark.sql.types.StructType(inferred.map(f =>
        if (f.name.startsWith("__p_"))
          f.copy(dataType = org.apache.spark.sql.types.StringType)
        else f))
      spark.read.schema(fixed).parquet(dir)
    }
  }

  /** The pruning predicate for a metadata-equality query against a
    * layout written with [[saveByMetadata]]: missing-key⇒"" parity with
    * `Filters.whereClause`. The coalesce is load-bearing — Hive
    * partitioning stores ""/null values as the DEFAULT partition and
    * reads them back as null, so a bare `=== ""` would silently miss
    * every missing-key row. Still a deterministic predicate over the
    * partition column, so it prunes at listing time. */
  def metaFilter(key: String, value: String): Column =
    coalesce(col(metaCol(key)), lit("")) === value
}
