package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Document

/**
 * Corpus readers that conform arbitrary files to the canonical document
 * schema `(id, metadata map, embedding, content)` for `Collection.addDF`
 * — the Spark-scale analog of the reference's example ingestion loop
 * (examples/rag-wikipedia-ollama/main.go:63-97 reads a JSONL corpus and
 * adds one Document per line).
 *
 * All readers are plain `spark.read` plans: schema inference is bounded,
 * filters/pruning push down, and the result is splittable input — no
 * driver-side file loops.
 */
object DocumentSource {

  /** JSONL corpus: one JSON object per line. `idField` null ⇒ stable
    * row ids derived from content hash (re-ingest idempotent). */
  def fromJsonl(
      spark: SparkSession,
      path: String,
      contentField: String,
      idField: String = null,
      metadataFields: Seq[String] = Seq.empty): DataFrame =
    conform(spark.read.json(path), contentField, idField, metadataFields)

  /** CSV with header. */
  def fromCsv(
      spark: SparkSession,
      path: String,
      contentField: String,
      idField: String = null,
      metadataFields: Seq[String] = Seq.empty): DataFrame =
    conform(spark.read.option("header", "true").csv(path),
      contentField, idField, metadataFields)

  /** Parquet with arbitrary columns. */
  def fromParquet(
      spark: SparkSession,
      path: String,
      contentField: String,
      idField: String = null,
      metadataFields: Seq[String] = Seq.empty): DataFrame =
    conform(spark.read.parquet(path), contentField, idField, metadataFields)

  /** Plain text: one document per LINE, ids = content md5. */
  def fromTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(col("value")) > 0)
      .select(
        md5(col("value")).as("id"),
        typedLit(Map.empty[String, String]).as("metadata"),
        lit(null).cast("array<float>").as("embedding"),
        col("value").as("content"))

  /** Map any DataFrame onto the document schema. Metadata sources, in
    * precedence order: explicit `metadataFields` (top-level columns,
    * missing values → ""); otherwise a `metadata` column passes through —
    * as a map directly, or as the struct `spark.read.json` infers for a
    * JSON object (keys whose value is absent on a row are dropped, so
    * [[writeJsonl]] output round-trips to the original per-row maps).
    *
    * Rows with a NULL content field and no `idField` get a NULL id
    * (md5(null) is null) — deliberately passed through, not silently
    * dropped: `Collection.addDocuments` rejects empty/null ids loudly,
    * which is the right surface for a corrupt source row. Filter
    * `col(contentField).isNotNull` first if nulls are expected. */
  def conform(
      df: DataFrame,
      contentField: String,
      idField: String = null,
      metadataFields: Seq[String] = Seq.empty): DataFrame = {
    require(df.columns.contains(contentField),
      s"content field '$contentField' not found in ${df.columns.mkString(",")}")
    val id: Column =
      if (idField != null) col(idField).cast("string")
      else md5(col(contentField).cast("string"))
    val metadata: Column =
      if (metadataFields.nonEmpty)
        map(metadataFields.flatMap(f =>
          Seq(lit(f), coalesce(col(f).cast("string"), lit("")))): _*)
      else if (df.columns.contains("metadata"))
        df.schema("metadata").dataType match {
          case _: org.apache.spark.sql.types.MapType =>
            coalesce(col("metadata").cast("map<string,string>"),
              typedLit(Map.empty[String, String]))
          case s: org.apache.spark.sql.types.StructType if s.fields.nonEmpty =>
            map_filter(map(s.fields.toSeq.flatMap(f => Seq(lit(f.name),
              col("metadata").getField(f.name).cast("string"))): _*),
              (_, v) => v.isNotNull)
          case _ => typedLit(Map.empty[String, String])
        }
      else typedLit(Map.empty[String, String])
    val embedding: Column =
      if (df.columns.contains("embedding")) col("embedding").cast("array<float>")
      else lit(null).cast("array<float>")
    df.select(
      id.as("id"),
      metadata.as("metadata"),
      embedding.as("embedding"),
      col(contentField).cast("string").as("content"))
  }

  /**
   * JSONL corpus writer — the interchange format training stacks ingest
   * (one JSON object per line: id, content, metadata as a nested
   * object, embedding as a number array when present). Distributed
   * `text` write, one file per partition; `repartition` first to
   * control file count. Round-trips through `fromJsonl` including the
   * per-row metadata maps (pinned in DocumentSourceSpec; `conform`
   * rebuilds the maps from the inferred struct, dropping keys a row
   * doesn't carry).
   */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.select(to_json(struct(
        col("id"), col("content"), col("metadata"), col("embedding"))).as("value"))
      .write.mode("overwrite").text(path)
}
