package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters summary as a mergeable AGGREGATE — the
 * fixed-memory scale tier for "top values of an unbounded-cardinality
 * column" (the exact tier, `Profile.topValues`, pays a full group-by
 * whose state grows with the domain).
 *
 * Buffer: ≤ `capacity` (value, counter) pairs. Update is the classic
 * rule (Misra & Gries 1982): increment a present key, insert when below
 * capacity, otherwise decrement ALL counters and drop zeros. Merge is
 * the mergeable-summaries rule (Agarwal et al., PODS 2012): sum shared
 * counters, and if the union exceeds capacity subtract the
 * (capacity+1)-th largest counter from every entry and drop ≤0 — the
 * result is again a valid summary with error ≤ n/(capacity+1).
 *
 * Determinism contract: while the number of DISTINCT values stays ≤
 * capacity no decrement ever fires, every counter is the exact count,
 * and the result is independent of partitioning and merge order — that
 * regime is the oracle-gated one. Above capacity the ESTIMATES (not the
 * guarantee) depend on merge order, as with any MG deployment; every
 * true heavy hitter with frequency > n/(capacity+1) is retained, and
 * each estimate is within n/(capacity+1) below its true count
 * (spec-pinned on a skewed corpus).
 *
 * Scale shape: partial ObjectHashAggregate folds each map task into one
 * ≤capacity map; the only exchange carries partitions × (≤capacity)
 * entries — independent of both corpus size and domain cardinality.
 */
object MisraGries {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  /** Aggregate `value` (string) into array<struct<value,count>> sorted
    * (count DESC, value ASC) — the ≤capacity retained counters. */
  def mg_sketch(value: Column, capacity: Int): Column =
    column(MisraGriesAgg(expr(value), capacity).toAggregateExpression())
}

case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  // analysis-time guard (HashTypeChecks house rule): a wrong input type
  // must fail analysis, not ClassCastException mid-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    HashTypeChecks.string(child.dataType, "mg_sketch")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None =>
          // decrement-all; materialize the key list first (mutation-safe)
          val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toArray
          buf.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter from every entry
      val counts = buf.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - m)
      buf.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      val c = in.readLong()
      buf.update(new String(kb, "UTF-8"), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "mg_sketch"
}
