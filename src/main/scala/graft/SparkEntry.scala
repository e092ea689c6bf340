package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Filters
import graft.ops.{Dedup, TextAnalysis, VectorSearch}

/**
 * Driver contract — one entry per implemented operator from SURVEY.md §2,
 * expressed over the driver-provided TPC-H-ish testdata tables, each with
 * an equivalent DuckDB oracle in `oracleSql`.
 *
 * Precision discipline (the driver hash-compares values):
 *  - similarity scores: double accumulation in BOTH engines (dot_f64 here,
 *    `embedding::DOUBLE[]` + list_dot_product there), rounded to 4 dp in
 *    the projection only (never in the ORDER BY).
 *  - money/measure sums: fixed-decimal inputs sum as ROUNDED INTEGER
 *    units (cents) — exact, order-independent, and ~2× cheaper than
 *    DECIMAL(38) accumulation in both engines — divided back at the end.
 *  - counts/sizes cast to BIGINT to match DuckDB's len()/count() types.
 */
object SparkEntry {

  import graft.GateSupport.{t, vec}

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Exercises the full parity API: documents+embeddings become a
    * Collection, then a filtered similarity query runs through
    * Collection.queryDF (metadata predicate + float32 scoring + top-k). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    val asDocs = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(
        col("doc_id").cast("string").as("id"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("metadata"),
        col("embedding"),
        col("text").as("content"))
    val db = graft.core.DB.inMemory(spark, new graft.embed.HashingEmbeddingFunc(64))
    val c = db.createCollection("flagship")
    c.addDF(asDocs)
    c.queryDF(vec(spark, dir, 0), 10, where = Map("lang" -> "en"))
  }

  /** Gate registry — assembled from the per-domain files
    * (SparkEntryCore/Dedup/Text/Rel/Events/Emb/Multimodal), one entry
    * per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntryCore.queries ++ SparkEntryDedup.queries ++
    SparkEntryText.queries ++ SparkEntryRel.queries ++
    SparkEntryEvents.queries ++ SparkEntryEmb.queries ++
    SparkEntryMultimodal.queries

  /** Driver-contract oracle dump (scope-less GateStage resolution:
    * correct in the single-scope JVMs the driver runs; a multi-scope
    * JVM gets a loud `__AMBIGUOUS_STAGE__` sentinel). Prefer
    * [[oracleSqlScoped]] when the dump's sf dir is known. */
  def oracleSql: Map[String, String] = assembleOracle(None)

  /** Oracle dump with GateStage globs resolved for the given Verify
    * scope (the sf dir) — safe even when one JVM staged several scopes. */
  def oracleSqlScoped(scope: String): Map[String, String] =
    assembleOracle(Some(scope))

  private def assembleOracle(scope: Option[String]): Map[String, String] =
    SparkEntryCore.oracleSql ++ SparkEntryDedup.oracleSql ++
    SparkEntryText.oracleSql ++ SparkEntryRel.oracleSql ++
    SparkEntryEvents.oracleSql ++ SparkEntryEmb.oracleSql ++
    SparkEntryMultimodal.oracleSql(scope)

  /** See [[GateSupport.releaseCaches]] — re-exported because callers
    * (Bench) reach the registry, not its plumbing. */
  def releaseCaches(): Unit = GateSupport.releaseCaches()
}
