package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Element-wise sum of long arrays as a declarative AGGREGATE — the
 * scale-correct kernel for embedding pooling (group centroids, class
 * prototypes, cluster means).
 *
 * Why an aggregate and not posexplode+groupBy: exploding first multiplies
 * the shuffle by the vector dimension (d=1536 ⇒ a 1536× wider exchange
 * BEFORE any combining can happen). As a TypedImperativeAggregate the
 * partial/final split applies: each map task folds its rows into one
 * d-long buffer per group, and the exchange carries partitions × groups
 * fixed-size arrays — independent of corpus size. Long inputs (callers
 * scale floats to integers first) make the sum exact and order-independent,
 * so results are deterministic under any partitioning.
 */
object VectorSumAggregate {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  /** Sum `array<long>` columns element-wise within each group. All non-null
    * inputs in a group must share one length; mismatches raise. */
  def vector_sum_long(vec: Column): Column =
    column(VectorSumLong(expr(vec)).toAggregateExpression())
}

case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // analysis-time guard (the HashTypeChecks house rule): without it an
  // array<int>/array<double> child passes analysis and toLongArray
  // misreads 4-byte elements as 8-byte longs — silent garbage sums
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    HashTypeChecks.longArray(child.dataType, "vector_sum_long")

  // empty = "no input seen yet"; the first row fixes the dimension
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (buf.isEmpty) v
    else {
      if (buf.length != v.length) throw new IllegalArgumentException(
        s"vector_sum_long: dimension mismatch (${buf.length} vs ${v.length})")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      // a zero-length INPUT array would be indistinguishable from the
      // "no input yet" buffer sentinel — reject it explicitly (the
      // scaladoc's mismatch promise) instead of silently ignoring it
      if (arr.isEmpty) throw new IllegalArgumentException(
        "vector_sum_long: zero-length input vector")
      add(buf, arr)
    }
  }

  // An EMPTY partial is legitimate (a partition whose rows for this
  // group were all NULL) and must merge as the identity from either
  // side — `add` alone would throw a dimension mismatch when the empty
  // partial arrives second, making the crash partial-arrival-order
  // dependent.
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else add(buf, other)

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumLong =
    copy(child = newChildren.head)

  override def prettyName: String = "vector_sum_long"
}
