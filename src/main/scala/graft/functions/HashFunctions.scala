package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

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
    require(numHashes <= MaxHashes, s"numHashes must be <= $MaxHashes")
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
      var j = 0
      val end = math.min(n, s + w)
      var k = s
      while (k < end) { sh = sh * 0x100000001B3L + base(k); k += 1; j += 1 }
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

case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int = 1)
    extends UnaryExpression {
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
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    HashKernels.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashKernels.simhash64($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}
