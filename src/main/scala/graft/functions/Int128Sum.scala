package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/**
 * Exact sum of a bigint column in a signed 128-bit two-long accumulator,
 * returned as decimal(38,0).
 *
 * Why not `sum(col.cast(decimal(38,0)))`: the decimal path wraps every
 * input row in a `Decimal` object and, once a partition's partial sum
 * leaves the compact-long range (|v| ≥ ~9.2e18 — routine at billions of
 * rows per partition over ~1e14-magnitude products), every subsequent
 * row add allocates a `java.math.BigDecimal`. This accumulator is two
 * primitive longs for the entire run regardless of magnitude: per-row
 * cost is one add + carry, bounded state, no allocation, and the merge
 * is the same 128-bit add — bit-deterministic under any partitioning
 * (integer addition commutes). Range ±2^127 ≈ ±1.7e38 covers decimal(38)
 * sums; overflow past that throws rather than wrapping.
 *
 * The per-row child is evaluated INTERPRETED (TypedImperativeAggregate
 * contract) — feed it a bare column reference and compute products in a
 * codegen projection upstream (see Profile.corrExact).
 */
case class Int128Sum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // SQL sum: null when no rows contribute
  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${other.sql}")
  }

  // buf = (hi, lo, seen): value = hi * 2^64 + (lo unsigned); seen
  // distinguishes an all-null/empty group (SQL sum -> null) from a true 0
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L, 0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // sign-extend to 128 bits
      Int128Sum.add128(buf, if (x < 0) -1L else 0L, x, prettyName)
      buf(2) = 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    Int128Sum.add128(buf, other(0), other(1), prettyName)
    buf(2) |= other(2)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(2) == 0L) null else Int128Sum.toDecimal(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Int128Sum.ser(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = Int128Sum.deser(bytes)

  override def withNewMutableAggBufferOffset(o: Int): Int128Sum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Int128Sum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "int128_sum"
}

/**
 * Exact Σ x·y over two bigint columns in a signed 128-bit accumulator,
 * as decimal(38,0). The per-row product is computed in full 128-bit
 * precision (`Math.multiplyHigh` intrinsic + wrapping low word), so any
 * long inputs are exact — up to ~1e16-scaled values squaring to ~1e32
 * per row, the documented corrExact envelope, where a 64-bit product
 * would silently wrap. Null if either side is null (SQL sum(x*y)
 * semantics: the row is skipped).
 */
case class Int128SumProduct(
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = true // SQL sum(x*y): null when no rows contribute
  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes(): TypeCheckResult =
    (x.dataType, y.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint inputs, got ${a.sql}, ${b.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L, 0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = x.eval(input)
    if (xv != null) {
      val yv = y.eval(input)
      if (yv != null) {
        val a = xv.asInstanceOf[Long]
        val b = yv.asInstanceOf[Long]
        Int128Sum.add128(buf, Math.multiplyHigh(a, b), a * b, prettyName)
        buf(2) = 1L
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    Int128Sum.add128(buf, other(0), other(1), prettyName)
    buf(2) |= other(2)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(2) == 0L) null else Int128Sum.toDecimal(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Int128Sum.ser(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = Int128Sum.deser(bytes)

  override def withNewMutableAggBufferOffset(o: Int): Int128SumProduct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Int128SumProduct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(x = cs(0), y = cs(1))
  override def prettyName: String = "int128_sum_product"
}

object Int128Sum {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Exact 128-bit sum of a bigint column as decimal(38,0). */
  def sum128(c: Column): Column =
    column(Int128Sum(toExpr(c)).toAggregateExpression())

  /** Exact 128-bit Σ x·y of two bigint columns as decimal(38,0). */
  def sumProduct128(x: Column, y: Column): Column =
    column(Int128SumProduct(toExpr(x), toExpr(y)).toAggregateExpression())

  // shared (hi, lo) two-long accumulator add; lo is unsigned
  private[functions] def add128(
      buf: Array[Long], hi: Long, lo: Long, name: String): Unit = {
    val newLo = buf(1) + lo
    // unsigned carry-out of the low word
    val carry = if (java.lang.Long.compareUnsigned(newLo, buf(1)) < 0) 1L else 0L
    val oldHi = buf(0)
    val newHi = oldHi + hi + carry
    // signed overflow of the high word = true 128-bit overflow. Test
    // against `hi` (the addend's real high word), NOT hi + carry: that
    // intermediate can itself wrap (hi = MaxValue, carry = 1) and the
    // corrupted operand would mask a genuine overflow near ±2^127.
    // A mixed-sign pair can never overflow even with the carry, so
    // requiring newHi's sign to differ from BOTH operands is exact.
    if (((oldHi ^ newHi) & (hi ^ newHi)) < 0) {
      throw new ArithmeticException(s"$name overflowed 128 bits")
    }
    buf(0) = newHi
    buf(1) = newLo
  }

  private[functions] def ser(buf: Array[Long]): Array[Byte] =
    java.nio.ByteBuffer.allocate(24)
      .putLong(buf(0)).putLong(buf(1)).putLong(buf(2)).array()

  private[functions] def deser(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong, bb.getLong, bb.getLong)
  }

  // largest magnitude representable in decimal(38,0); sums in
  // [1e38, 2^127) fit the 128-bit accumulator but not the result type
  private val MaxDecimal38 = new java.math.BigInteger("9".repeat(38))

  private[functions] def toDecimal(buf: Array[Long]): Decimal = {
    val bytes = java.nio.ByteBuffer.allocate(16)
      .putLong(buf(0)).putLong(buf(1)).array()
    val bi = new java.math.BigInteger(bytes)
    // without this, Decimal(.., 38, 0) dies with an opaque "precision 39
    // exceeds max precision 38" at final evaluation — name the real
    // problem instead
    if (bi.abs.compareTo(MaxDecimal38) > 0) throw new ArithmeticException(
      s"128-bit sum $bi has 39 digits and overflows decimal(38,0)")
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }
}
