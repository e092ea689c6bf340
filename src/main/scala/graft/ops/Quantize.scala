package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar int8 embedding quantization — the storage/bandwidth lever for
 * vector corpora at scale. A d=1536 float32 embedding is 6 KB; symmetric
 * per-vector int8 cuts that 4× (plus a 8 B scale), which at 100 TB of
 * embeddings is 75 TB less scan IO and shuffle payload. Scoring happens
 * in exact INTEGER arithmetic (Σ qa·qb with |q| ≤ 127 ⇒ |dot| ≤
 * 127²·d < 2^53 even at d=10⁶) and rescales once per row, so quantized
 * scores are deterministic and bit-reproducible across engines — unlike
 * float dot products, there is no accumulation-order sensitivity at all.
 *
 * The reference scores exact float32 cosine only (`/root/reference/
 * vector.go:14-26`); this is the additional tier a billion-vector
 * deployment uses for its first-pass scan, optionally re-ranking the
 * top candidates with the exact kernel.
 */
object Quantize {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => gcol, expression => gexpr}

  /** Per-vector symmetric scale: max|xᵢ| / 127 (0 for the zero vector;
    * null for an empty vector). Native codegen kernel over array<float>
    * ([[graft.functions.MaxAbsScaleF32]]) — bit-identical to the
    * pre-r15 `array_max(transform(abs(cast)))/127` chain it replaced
    * (QuantizeKernelSpec pins the equivalence against a frozen copy). */
  def scaleCol(vecCol: Column): Column =
    gcol(graft.functions.MaxAbsScaleF32(gexpr(vecCol)))

  /** Quantized vector: round(xᵢ / scale) as int (∈ [−127, 127]); the zero
    * vector quantizes to zeros. HALF_UP rounding (away from zero) —
    * the portable convention shared by Spark's `round` and DuckDB's.
    * Native codegen kernel ([[graft.functions.QuantizeArrF32]], the
    * property-pinned allocation-free HALF_UP) — the `transform(round(
    * x/scale))` chain it replaced evaluated the lambda interpreted and
    * paid two BigDecimal allocations per ELEMENT, which dominated big
    * q8 slab builds (SURVEY r15 item 15). Outputs are bit-identical. */
  def quantizeCol(vecCol: Column, scale: Column): Column =
    gcol(graft.functions.QuantizeArrF32(gexpr(vecCol), gexpr(scale)))

  /** Add `qvec` (int8-range ints) and `qscale` (double) columns. */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val s = scaleCol(col(vecCol))
    df.withColumn("qscale", s)
      .withColumn("qvec", quantizeCol(col(vecCol), col("qscale")))
  }

  /** Exact integer dot product of two quantized vectors (long — never
    * overflows for int8 payloads at any realistic dimensionality). */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), _ + _)

  /** Quantize a query vector driver-side with the same HALF_UP convention
    * as `quantizeCol`. Returns (qvec, scale). */
  def quantizeQuery(q: Array[Float]): (Array[Int], Double) = {
    // diagnostic, not empty.max: an empty query would otherwise surface
    // as UnsupportedOperationException("empty.max") with no mention of
    // vectors, and an all-empty corpus would never hit the scan's own
    // length-mismatch guard either
    require(q.nonEmpty, "query vector must be non-empty")
    val scale = q.map(x => math.abs(x.toDouble)).max / 127.0
    if (scale == 0.0) (Array.fill(q.length)(0), 0.0)
    // same pinned kernel as the column path (QuantizeKernels.halfUp ≡
    // BigDecimal(shortest rendering).setScale(0, HALF_UP) ≡ Spark Round
    // — KernelPropertySpec): ONE rounding implementation on both sides
    else (q.map(x =>
      graft.functions.QuantizeKernels.halfUp(x.toDouble / scale).toInt), scale)
  }

  /**
   * Top-k by QUANTIZED similarity: score = (Σ qaᵢ·qbᵢ) · scale_doc ·
   * scale_query ≈ the float dot product. `df` must be pre-quantized
   * (`quantize`); only `qvec`/`qscale` are read, so a columnar scan never
   * touches the float embeddings — that column-pruning is the entire
   * 4× IO win. Deterministic: integer dot, fixed rescale order, id
   * tie-break.
   */
  def quantizedTopK(
      df: DataFrame,
      queryVec: Array[Float],
      k: Int,
      idCol: String): DataFrame = {
    require(k > 0, "k must be > 0")
    val (qq, qs) = quantizeQuery(queryVec)
    val qlit = array(qq.map(v => lit(v)).toIndexedSeq: _*)
    // in-scan length check: zip_with would silently null-pad a mismatched
    // query and return k rows of null scores
    val score = when(size(col("qvec")) =!= lit(qq.length),
        raise_error(concat(
          lit(s"query length ${qq.length} does not match qvec length "),
          size(col("qvec")).cast("string"))).cast("double"))
      .otherwise(qdot(col("qvec"), qlit).cast("double") * col("qscale") * lit(qs))
    df.withColumn("qsim", score)
      .orderBy(desc("qsim"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("qsim"))
  }

  /**
   * Quantized first pass + exact re-rank: scan the int8 corpus for the
   * top `rerankK` candidates, then score ONLY those with the exact f64
   * kernel over the float column and return the top `k`. The float
   * embeddings are read for `rerankK` rows instead of the whole corpus —
   * at a billion vectors that is the difference between a 6 KB/row scan
   * and a 1.5 KB/row scan plus a point-lookup join.
   */
  def quantizedTopKRerank(
      df: DataFrame,
      vecCol: String,
      queryVec: Array[Float],
      k: Int,
      idCol: String,
      rerankK: Int): DataFrame = {
    require(rerankK >= k, "rerankK must be >= k")
    VectorSearch.exactRerank(df, vecCol, idCol,
      quantizedTopK(df, queryVec, rerankK, idCol), queryVec, k)
  }

  /**
   * BINARY quantization tier: sign-bit signatures (dim ≤ 64 → ONE long
   * per vector, 64× less than int8, 256× less than float32) ranked by
   * Hamming distance to the query signature — `popcount(sig ⊕ qsig)`,
   * the standard angular-distance surrogate (a sign bit is a fixed
   * hyperplane; Hamming/d estimates θ/π). The whole scan reads 8 B per
   * row and stays in whole-stage codegen; top-k is
   * TakeOrderedAndProject. Exact and SQL-replayable: signatures are
   * integer bit tests (v > 0), distance is an integer popcount, ties
   * break by id — no floats anywhere past the sign test.
   *
   * The coarsest tier of the scan family (binary → int8 [[quantizedTopK]]
   * → float [[VectorSearch.topK]]); compose with
   * [[VectorSearch.exactRerank]] for a refine pass.
   */
  def hammingTopK(
      df: DataFrame,
      vecCol: String,
      queryVec: Array[Float],
      k: Int,
      idCol: String): DataFrame = {
    require(k > 0, "k must be > 0")
    val qsig = graft.functions.DenseVec.signBitsLocal(queryVec)
    // isNotNull: an ASCENDING sort puts the null hamming of an
    // un-embedded row FIRST, returning it as the best match — every
    // similarity-descending tier in this module sorts nulls last by
    // accident of direction; this one must filter explicitly
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        bit_count(graft.functions.DenseVec.sign_bits64(col(vecCol))
          .bitwiseXOR(lit(qsig))).cast("long").as("hamming"))
      .orderBy(asc("hamming"), asc(idCol))
      .limit(k)
  }
}
