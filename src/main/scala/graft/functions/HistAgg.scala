package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/**
 * Exact (value-div-`div` → count) histogram aggregate over a long
 * column, as map<long, long>. The one-pass primitive behind the exact
 * quantile profiler's histogram-selection algorithm: aggregate state is
 * bounded by the number of OCCUPIED buckets (≤ distinct values / div in
 * dense domains), never by row count — with `maxEntries` as the hard
 * guard against pathological sparse domains (random 64-bit ids), where
 * the caller should sketch (`exact = false`) instead.
 *
 * Merge is integer-sum commutative and eval emits keys sorted, so the
 * result is bit-deterministic under any partitioning.
 */
case class LongBucketCounts(
    child: Expression,
    div: Long,
    maxEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  require(div > 0, "div must be > 0")
  // upper bound: serialize() writes 4 + size*16 bytes into one byte
  // array — beyond (Int.MaxValue - 4)/16 entries the int length math
  // would overflow negative and fail mid-shuffle, far from the cause
  require(maxEntries > 0 && maxEntries <= (Int.MaxValue - 4) / 16,
    s"maxEntries must be in (0, ${(Int.MaxValue - 4) / 16}]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${other.sql}")
  }

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  private def bump(
      buf: scala.collection.mutable.LongMap[Long], k: Long, by: Long): Unit = {
    // two probes per row (the r15 form replaced contains + getOrElse +
    // update = three on the hot interpreted update path); the occupancy
    // guard fires on the same inserts as before — when the insert would
    // exceed maxEntries — just checked after the fact (the task dies
    // either way, the buffer is discarded with it)
    buf(k) = buf.getOrElse(k, 0L) + by
    if (buf.size > maxEntries) {
      throw new IllegalStateException(
        s"$prettyName exceeded $maxEntries occupied buckets - the value " +
        "domain is too sparse for an exact histogram; use the sketch tier")
    }
  }

  override def update(
      buf: scala.collection.mutable.LongMap[Long],
      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, Math.floorDiv(v.asInstanceOf[Long], div), 1L)
    buf
  }

  override def merge(
      buf: scala.collection.mutable.LongMap[Long],
      other: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    other.foreachEntry((k, c) => bump(buf, k, c))
    buf
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    val keys = buf.keys.toArray.sorted
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(keys.map(buf(_))))
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LongBucketCounts =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongBucketCounts =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "long_bucket_counts"
}

object HistAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Exact bucket→count map of a long column, bucket = value div `div`. */
  def bucket_counts(c: Column, div: Long, maxEntries: Int = 1 << 22): Column =
    column(LongBucketCounts(toExpr(c), div, maxEntries)
      .toAggregateExpression())
}
