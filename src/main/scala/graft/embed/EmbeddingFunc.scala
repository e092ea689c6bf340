package graft.embed

/**
 * Pluggable text→vector function — parity with reference db.go:22.
 * Contract: SHOULD return an L2-normalized vector (db.go:19-21); callers
 * normalize defensively when it doesn't.
 *
 * Serializable so it can ship into executors for `mapPartitions` batch
 * embedding (the reference calls it from worker goroutines,
 * collection.go:266-271; our worker is the Spark task).
 */
trait EmbeddingFunc extends Serializable {
  def embed(text: String): Array[Float]

  /** Batch hook: providers override to amortize one HTTP client / request
    * batching per partition. Default is per-text. */
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = texts.map(embed)
}

/** Constant stub — the deterministic fixture used across the reference
  * suite (normalized [-0.1, 0.1, 0.2]; reference collection_test.go:17-20). */
class ConstEmbeddingFunc(vec: Array[Float]) extends EmbeddingFunc {
  def embed(text: String): Array[Float] = vec.clone()
}

object ConstEmbeddingFunc {
  val stub3: Array[Float] = Array(-0.40824828f, 0.40824828f, 0.81649655f)
  def stub(): ConstEmbeddingFunc = new ConstEmbeddingFunc(stub3)
}

/**
 * Deterministic local embedder (no network; for tests and examples):
 * hashes character trigrams into `dim` buckets and L2-normalizes.
 * Similar texts → similar vectors, so ranking tests are meaningful.
 */
class HashingEmbeddingFunc(dim: Int = 64) extends EmbeddingFunc {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    // Locale.ROOT: embeddings must be identical on every executor JVM
    // regardless of its default locale (tr-TR dotless-ı would shift
    // every trigram hash of an uppercase-I text)
    val t = " " + (if (text == null) "" else
      text.toLowerCase(java.util.Locale.ROOT)) + " "
    var i = 0
    while (i + 3 <= t.length) {
      val h = t.substring(i, i + 3).hashCode
      v(math.floorMod(h, dim)) += (if (((h >>> 16) & 1) == 0) 1f else -1f)
      i += 1
    }
    graft.functions.VectorFunctions.normalize(v)
  }
}
