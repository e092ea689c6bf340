package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared analysis-time checks for the SQL-registered hash kernels: a
  * wrong element type must fail analysis, not misread bytes at runtime
  * (`getLong` over 4-byte int slots / `getUTF8String` over numerics
  * yields garbage or a task-time ClassCastException). */
private[functions] object HashTypeChecks {
  def tokenArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<string> input, got ${other.sql}")
  }
  def longArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<bigint> input, got ${other.sql}")
  }
  def string(dt: DataType, fn: String): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires string input, got ${other.sql}")
  }
  def long(dt: DataType, fn: String): TypeCheckResult = dt match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires bigint input, got ${other.sql}")
  }
}

/**
 * Per-row signature kernels for large-scale dedup.
 *
 * Both MinHash and SimHash are computed as NATIVE per-row scalar
 * expressions over a token array — no explode, no shuffle, no UDF boxing.
 * At 100 TB this is the difference between a map-only signature pass and
 * an exploded token table orders of magnitude larger than the input.
 * Hashing uses Spark's own XXH64 (same kernel as the xxhash64() builtin),
 * so results are stable across the cluster and across sessions.
 */
object HashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  /** MinHash signature over w-shingles of the token array — Broder '97
    * resemblance sketches. Each token is XXH64-hashed ONCE; shingle
    * hashes combine token hashes by rolling polynomial; the `numHashes`
    * hash family is derived by per-function affine mixing (splitmix64
    * constants) — ~64× fewer string hashes than hashing each shingle
    * per seed, and no shingle-string allocation at all. */
  def minhash_signature(tokens: Column, numHashes: Int, shingleSize: Int = 1): Column =
    column(MinHashSignature(expr(tokens), numHashes, shingleSize))

  /** 64-bit SimHash (Charikar '02): sign of per-bit vote sums over token
    * hashes. Hamming-close signatures ⇒ similar token multisets. */
  def simhash64(tokens: Column): Column = column(SimHash64(expr(tokens)))

  /** SORTED array of distinct 64-bit w-shingle hashes — the set-Jaccard
    * currency for MinHash verification. Same rolling-polynomial shingle
    * hash as [[minhash_signature]]; representing shingles by their hash
    * instead of a rebuilt string skips all shingle-string allocation
    * (measured ~10× on the verification pass), and sorted arrays let the
    * Jaccard be a linear merge. */
  def shingle_hashes(tokens: Column, shingleSize: Int): Column =
    column(ShingleHashes(expr(tokens), shingleSize))

  /** Jaccard of two SORTED long arrays via linear merge — no hash-set
    * build per row, pure codegen. */
  def jaccard_sorted(a: Column, b: Column): Column =
    column(JaccardSorted(expr(a), expr(b)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}

/** Static kernels shared by interpreted eval and generated code. */
object HashKernels {

  /** splitmix64 finalizer — cheap, well-mixed per-function constants. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // affine family h_i(x) = A(i)*x + B(i) over 2^64 (A odd) — the standard
  // one-hash minhash construction (Broder '97 + universal hashing).
  private val MaxHashes = 256
  private val A: Array[Long] =
    Array.tabulate(MaxHashes)(i => splitmix64(2L * i) | 1L)
  private val B: Array[Long] =
    Array.tabulate(MaxHashes)(i => splitmix64(2L * i + 1))

  def minhash(toks: ArrayData, numHashes: Int, shingleSize: Int): ArrayData = {
    // lower bound too: numHashes=0 silently produced an empty signature
    // per row, and downstream LSH banding over empty slices degenerates
    // (every doc shares every empty band) instead of failing fast
    require(numHashes >= 1 && numHashes <= MaxHashes,
      s"numHashes must be in [1, $MaxHashes]")
    val n = toks.numElements()
    val w = math.max(1, shingleSize)
    // base hash per token, hashed exactly once
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      base(i) = if (toks.isNullAt(i)) 0L
        else XXH64.hashUTF8String(toks.getUTF8String(i), 0L)
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = if (n == 0) 0 else math.max(1, n - w + 1)
    var s = 0
    while (s < nShingles) {
      // rolling-polynomial shingle hash over the w token hashes
      var sh = 0L
      val end = math.min(n, s + w)
      var k = s
      while (k < end) { sh = sh * 0x100000001B3L + base(k); k += 1 }
      var h = 0
      while (h < numHashes) {
        val v = A(h) * sh + B(h)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct sorted 64-bit shingle hashes; EXACTLY the same rolling
    * shingle hash as [[minhash]] (token XXH64 once, polynomial combine),
    * and the same windowing: one shingle when 0 < n < w (the whole doc),
    * ZERO shingles when n == 0 — matching minhash's empty-doc rule, so
    * hash-set Jaccard equals shingle-string Jaccard up to 64-bit
    * collisions (~2^-64 per pair — ignorable and deterministic). (The
    * previous max(1, …) emitted a zero-hash shingle for EMPTY docs,
    * making any two empty docs Jaccard-1.0 here — verify and candidate
    * stages disagreed exactly on the degenerate case.)
    *
    * Empty-doc caveat: with zero shingles, [[minhash]] leaves the
    * signature at all-Long.MaxValue, so every empty doc shares ONE
    * signature and LSH banding pairs them all — an O(n²) candidate
    * blowup on that degenerate class (the pairs are then rejected at
    * verify, since two zero-shingle docs score Jaccard 0.0 here, so
    * correctness holds). Filter empty token arrays before banding if
    * your tokenizer can produce them; `Dedup.tokens` never does (a
    * split always yields ≥ 1 element). */
  def shingleHashes(toks: ArrayData, shingleSize: Int): ArrayData = {
    val n = toks.numElements()
    val w = math.max(1, shingleSize)
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      base(i) = if (toks.isNullAt(i)) 0L
        else XXH64.hashUTF8String(toks.getUTF8String(i), 0L)
      i += 1
    }
    val nShingles = if (n == 0) 0 else math.max(1, n - w + 1)
    val out = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      var sh = 0L
      var k = s
      val end = math.min(n, s + w)
      while (k < end) { sh = sh * 0x100000001B3L + base(k); k += 1 }
      out(s) = sh
      s += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var m = 0
    i = 0
    while (i < nShingles) {
      if (m == 0 || out(i) != out(m - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Jaccard of two sorted distinct long arrays by linear merge. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  def simhash64(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = XXH64.hashUTF8String(toks.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

case class ShingleHashes(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashTypeChecks.tokenArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    HashKernels.shingleHashes(a.asInstanceOf[ArrayData], shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.HashKernels.shingleHashes($x, $shingleSize)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = HashTypeChecks.longArray(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else HashTypeChecks.longArray(right.dataType, prettyName)
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}

case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int = 1)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashTypeChecks.tokenArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    HashKernels.minhash(a.asInstanceOf[ArrayData], numHashes, shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.HashKernels.minhash($x, $numHashes, $shingleSize)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashTypeChecks.tokenArray(child.dataType, prettyName)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    HashKernels.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashKernels.simhash64($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}
