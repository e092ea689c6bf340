package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, LongType}

/**
 * Exact upper-triangle Gram matrix Σ x·xᵀ of an `array<bigint>` column,
 * every entry a signed 128-bit sum, returned as
 * `array<decimal(38,0)>` in row-major upper-triangle order
 * (`idx(i,j) = i·m − i(i−1)/2 + (j−i)`, i ≤ j).
 *
 * Feed it the AUGMENTED vector (1, e7₀, …, e7_{d−1}) and one aggregate
 * yields every moment a covariance/PCA needs — n at (0,0), first
 * moments Σe7ᵢ in row 0, second moments Σe7ᵢe7ⱼ in the rest — so the
 * whole profile is ONE scan plus one exchange of a fixed
 * ~m²·17-byte buffer per partition (map-side combined; 35 KB at
 * d = 64), the same shuffle volume class as a count.
 *
 * Per-row cost is the m(m+1)/2 `multiplyHigh` FMA triangle — the price
 * of an EXACT Gram matrix (a float32 BLAS syrk is faster but its sums
 * are partition-order dependent; these moments are bit-reproducible
 * under any partitioning and SQL-replayable). Row products are exact
 * 128-bit (`Math.multiplyHigh` + wrapping low word), covering
 * |e7| ≤ ~1e16 per element and ~1e24 rows before the 128-bit sum
 * overflow throws.
 *
 * TypedImperativeAggregate contract: the child is evaluated
 * interpreted — feed it a bare column reference and build the
 * augmented scaled array in a codegen projection upstream.
 */
case class GramOuterSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DecimalType(38, 0), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.sql}")
  }

  // buf layout: [m, hi₀, lo₀, hi₁, lo₁, …] for the t = m(m+1)/2
  // triangle entries; m = 0 marks "no rows seen yet" (sized lazily on
  // the first row — the dimension is data-defined)
  override def createAggregationBuffer(): Array[Long] = Array(0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val x = v.asInstanceOf[ArrayData]
    val m = x.numElements()
    // m == 0 would be conflated with the buf(0) == 0 "no rows yet"
    // marker: an empty-array-first partition would silently ignore the
    // row while a d-dim-first partition throws on it — flaky by
    // partition order. Reject it explicitly (same rule as
    // vector_sum_long). Null elements would read as 0 through getLong
    // and silently poison every moment — reject those too (the type
    // accepts containsNull=true because derived arrays are often
    // conservatively marked nullable; actual nulls are still an error).
    if (m == 0) throw new IllegalArgumentException(
      s"$prettyName: zero-length input vector")
    var c = 0
    while (c < m) {
      if (x.isNullAt(c)) throw new IllegalArgumentException(
        s"$prettyName: null element at index $c")
      c += 1
    }
    val b =
      if (buf(0) == 0L) {
        val nb = new Array[Long](1 + m * (m + 1)) // t pairs of (hi, lo)
        nb(0) = m
        nb
      } else {
        if (buf(0) != m) throw new IllegalArgumentException(
          s"$prettyName: vector length $m != first row's ${buf(0)}")
        buf
      }
    var i = 0
    var off = 1
    while (i < m) {
      val xi = x.getLong(i)
      var j = i
      while (j < m) {
        val xj = x.getLong(j)
        GramOuterSum.addAt(b, off, Math.multiplyHigh(xi, xj), xi * xj)
        off += 2
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other(0) == 0L) return buf
    if (buf(0) == 0L) return other
    if (buf(0) != other(0)) throw new IllegalArgumentException(
      s"$prettyName: merging gram buffers of different dimension")
    var off = 1
    while (off < buf.length) {
      GramOuterSum.addAt(buf, off, other(off), other(off + 1))
      off += 2
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(0) == 0L) return null
    val t = (buf.length - 1) / 2
    val out = new Array[Any](t)
    var k = 0
    while (k < t) {
      out(k) = Int128Sum.toDecimal(Array(buf(1 + 2 * k), buf(2 + 2 * k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramOuterSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramOuterSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "gram_outer_sum128"
}

object GramOuterSum {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Exact 128-bit upper-triangle Σ x·xᵀ as array<decimal(38,0)>. */
  def gram128(c: Column): Column =
    column(GramOuterSum(toExpr(c)).toAggregateExpression())

  // in-place 128-bit add at a (hi, lo) slot; lo is unsigned
  private def addAt(buf: Array[Long], off: Int, hi: Long, lo: Long): Unit = {
    val newLo = buf(off + 1) + lo
    val carry = if (java.lang.Long.compareUnsigned(newLo, buf(off + 1)) < 0) 1L else 0L
    val oldHi = buf(off)
    val newHi = oldHi + hi + carry
    // test against `hi`, not hi + carry — see Int128Sum.add128
    if (((oldHi ^ newHi) & (hi ^ newHi)) < 0) {
      throw new ArithmeticException("gram_outer_sum128 overflowed 128 bits")
    }
    buf(off) = newHi
    buf(off + 1) = newLo
  }
}
