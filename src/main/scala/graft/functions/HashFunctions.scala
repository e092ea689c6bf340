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

  /** MinHash signature: for each of `numHashes` seeds, min over tokens of
    * xxhash64(token, seed). Standard shingle→minhash construction
    * (Broder '97 resemblance sketches). */
  def minhash_signature(tokens: Column, numHashes: Int): Column =
    column(MinHashSignature(expr(tokens), numHashes))

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
  def minhash(toks: ArrayData, numHashes: Int): ArrayData = {
    val n = toks.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashUTF8String(t, h.toLong)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
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

case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    HashKernels.minhash(a.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashKernels.minhash($x, $numHashes)")
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
