package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ColBERT-style late-interaction (MaxSim) retrieval: query and document
 * are bags of sub-vectors and the score is Σ_i max_j ⟨q_i, d_j⟩ — each
 * query part matches its best document part, which preserves token-level
 * signal that single-vector pooling averages away (Khattab & Zaharia,
 * SIGIR 2020).
 *
 * Representation: a fixed-dim embedding column reshaped into `numSub`
 * contiguous sub-vectors (multi-vector-as-one-array — the layout a
 * 100 TB corpus wants anyway: one flat float array per row, no nested
 * structs on disk). A true per-token ColBERT corpus plugs in the same
 * scorer with numSub = token count.
 *
 * Exactness: sub-vector dots are exact integer Σ q7·d7 over
 * e7 = round(e·scale) (bound: subDim·scale² per dot — at scale=1e7,
 * subDim ≤ ~92). max and Σ over integers are order-free, so scores are
 * bit-stable and SQL-replayable.
 *
 * Scale shape: the query matrix rides the plan as literals; scoring is
 * one codegen'd map over the scan; top-k is the bounded-heap
 * TakeOrderedAndProject — zero wide shuffles, identical to the flat
 * similarity scan's cost envelope (numSub² dot products per row).
 */
object LateInteraction {

  /**
   * Top-k by MaxSim score of each row's `vecCol` against `queryVec`,
   * both reshaped to `numSub` equal sub-vectors. Returns (id, score)
   * with score in scale² integer units.
   */
  def maxSimTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Array[Float],
      numSub: Int,
      k: Int,
      scale: Long = 10000000L): DataFrame = {
    require(numSub >= 1, "numSub must be >= 1")
    require(queryVec.length % numSub == 0,
      s"query dim ${queryVec.length} not divisible into $numSub sub-vectors")
    val subDim = queryVec.length / numSub
    // HALF_UP (away from zero) to match SQL round() in both engines —
    // math.round would differ on negative exact halves
    val q7: Array[Array[Long]] = Array.tabulate(numSub, subDim)((i, w) =>
      java.math.BigDecimal.valueOf(queryVec(i * subDim + w).toDouble * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact)

    // All numSub² sub-dots in ONE codegen'd matmul pass: row (i·m + j)
    // holds q_i placed at doc-sub-vector j's offset (zeros elsewhere), so
    // dots[i·m + j] = ⟨q_i, d_j⟩. The staged projection evaluates the
    // kernel once per row; max/sum then run over the tiny m² array.
    val dim = queryVec.length
    val big = Array.tabulate(numSub * numSub, dim) { (r, c) =>
      val i = r / numSub; val j = r % numSub
      if (c >= j * subDim && c < (j + 1) * subDim) q7(i)(c - j * subDim) else 0L
    }
    val score = (0 until numSub).map(i =>
      array_max(slice(col("__dots"), i * numSub + 1, numSub))).reduce(_ + _)

    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol),
        graft.functions.IntKernels.scaled_matmul(col(vecCol), big, scale)
          .as("__dots"))
      .select(col(idCol), score.as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
