package graft.core

import org.apache.spark.sql.types._

/**
 * The single row type of the engine — parity with reference document.go:9-17.
 *
 * `metadata` is a dynamic string→string map (MapType, not StructType: keys
 * vary per row, reference document.go:11). `embedding` is float32 to keep
 * the reference's float32 similarity semantics (collection.go:407).
 */
case class Document(
    id: String,
    metadata: Map[String, String] = Map.empty,
    embedding: Array[Float] = null,
    content: String = null)

object Document {
  /** Canonical collection schema (SURVEY §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("content", StringType, nullable = true)))

  /** Constructor that embeds content when no vector is given — parity
    * with reference NewDocument (document.go:28-53), with ONE deliberate
    * deviation: the reference silently substitutes its default OpenAI
    * embedder when embeddingFunc is nil; this port has no ambient API
    * key to assume, so a null func returns the document UNEMBEDDED and
    * the embedding happens later on the add path (addDocuments /
    * addDF embed via the collection's func). Callers needing a
    * query-ready vector must pass a func here. */
  def create(
      id: String,
      metadata: Map[String, String] = Map.empty,
      embedding: Array[Float] = null,
      content: String = null,
      embeddingFunc: graft.embed.EmbeddingFunc = null): Document = {
    // NewDocument's own messages differ from the add-path ones
    // (document.go:30,33 vs collection.go:252,255) — keep both exact.
    if (id == null || id.isEmpty)
      throw new IllegalArgumentException("id is empty")
    if ((embedding == null || embedding.isEmpty) &&
        (content == null || content.isEmpty))
      throw new IllegalArgumentException("either embedding or content must be filled")
    val doc = Document(id, metadata, embedding, content)
    if ((embedding == null || embedding.isEmpty) && embeddingFunc != null)
      doc.copy(embedding = embeddingFunc.embed(content))
    else doc
  }

  /** Validation shared by add paths — reference collection.go:252-256. */
  def validate(doc: Document): Unit = {
    if (doc.id == null || doc.id.isEmpty)
      throw new IllegalArgumentException("document ID is empty")
    if ((doc.embedding == null || doc.embedding.isEmpty) &&
        (doc.content == null || doc.content.isEmpty))
      throw new IllegalArgumentException("either document embedding or content must be filled")
  }
}

/** Query output row = document + cosine similarity (reference collection.go:398-408). */
case class QueryResult(
    id: String,
    metadata: Map[String, String],
    embedding: Array[Float],
    content: String,
    similarity: Float)
