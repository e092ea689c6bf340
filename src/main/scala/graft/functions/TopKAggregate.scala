package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k as a declarative AGGREGATE — the scale-correct shape for
 * "top k rows per group" (batch kNN, grouped similarity ranking).
 *
 * Why an aggregate and not a window: `row_number().over(partitionBy(g))`
 * shuffles EVERY scored row to the reducer that owns its group before the
 * rank filter can drop any — at 100 TB with a broadcast query side that is
 * a corpus×queries exchange (the reference's query loop, query.go:16-83,
 * keeps a bounded heap per worker precisely to avoid this). Expressing
 * top-k as an aggregate hands Catalyst a partial/final split: each map
 * task folds its rows into a ≤k heap per group (ObjectHashAggregate
 * partial), and the exchange carries only partitions × groups × k rows —
 * independent of corpus size.
 *
 * The payload is a struct whose FIRST field ranks descending (the score)
 * and SECOND ranks ascending (the deterministic tie-break id); remaining
 * fields ride along untouched. `eval` returns the heap sorted best-first
 * as array<struct>, ready to `explode`.
 */
object TopKAggregate {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  /** Aggregate `payload` (struct: score desc, tiebreak asc, carry...) to
    * the top-k array of structs, best first. */
  def topk_rows(payload: Column, k: Int): Column =
    column(TopKRows(expr(payload), k).toAggregateExpression())
}

case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be > 0")

  // a non-struct payload or a 1-field struct would otherwise surface as
  // an opaque executor ClassCastException / IndexOutOfBounds from
  // rankOrd after the job launches — fail analysis instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length >= 2 &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s(0).dataType) &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s(1).dataType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a struct payload with >= 2 fields (rank " +
            s"desc, tiebreak asc — both orderable), got ${other.sql}")
    }

  private lazy val structType: StructType = child.dataType.asInstanceOf[StructType]

  /** compare(a, b) < 0 ⇔ a ranks strictly better (field0 desc, field1 asc). */
  private lazy val rankOrd: Ordering[InternalRow] = new InterpretedOrdering(Seq(
    SortOrder(BoundReference(0, structType(0).dataType, nullable = true), Descending),
    SortOrder(BoundReference(1, structType(1).dataType, nullable = true), Ascending)))

  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  // max-heap under rankOrd ⇒ head is the WORST retained row
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(rankOrd)

  private def offer(buf: mutable.PriorityQueue[InternalRow], row: InternalRow,
      copy: Boolean): Unit = {
    if (buf.size < k) buf.enqueue(if (copy) row.copy() else row)
    else if (rankOrd.compare(row, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(if (copy) row.copy() else row)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow], copy = true)
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(buf, _, copy = false))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(rankOrd).asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val bytes = toUnsafe(row).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rb = new Array[Byte](len)
      in.readFully(rb)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rb, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)

  override def prettyName: String = "topk_rows"
}
