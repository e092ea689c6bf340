package graft.core

/** Negative-query modes — parity with reference collection.go:33-49. */
object NegativeMode {
  /** Subtract the negative vector from the query vector before searching
    * (reference collection.go:42-44; the default). */
  val Subtract = "subtract"
  /** Drop documents whose similarity to the negative vector exceeds the
    * threshold (reference collection.go:45-46). */
  val Filter = "filter"
  /** Default threshold for Filter mode (reference collection.go:47). */
  val DefaultNegativeFilterThreshold: Float = 0.5f
}

/** Negative query spec — parity with reference collection.go:62-77. */
case class NegativeQueryOptions(
    mode: String = NegativeMode.Subtract,
    text: String = null,
    embedding: Array[Float] = null,
    filterThreshold: Float = 0f)

/** Declarative query spec — parity with reference collection.go:51-60. */
case class QueryOptions(
    queryText: String = null,
    queryEmbedding: Array[Float] = null,
    nResults: Int = 0,
    where: Map[String, String] = Map.empty,
    whereDocument: Map[String, String] = Map.empty,
    negative: NegativeQueryOptions = null)
