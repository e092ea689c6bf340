package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Exact cosine-threshold kernels over term-count bags PACKED as flat
 * `array<bigint>` `[tid₀, tf₀, tid₁, tf₁, …]`, sorted ascending by tid.
 * Term ids come from an exact dictionary join, NOT hashing — distinct
 * tokens get distinct ids, so the dot stays exact.
 *
 * Why packed longs and not `array<struct<tid, tf>>`: `ArrayData
 * .getStruct` allocates a fresh UnsafeRow VIEW per call, so a struct
 * merge costs two allocations per element per side — on a 23M-candidate
 * verify that is >10⁹ short-lived objects and the stage lives in GC
 * (measured 18 s; the packed kernel's pure `getLong` loop runs the same
 * stage in ~2 s). The string-keyed sibling [[BagDot]] keeps the struct
 * layout because its UTF8String keys can't pack into primitives.
 *
 * [[PackedBagCosGe]] is the verification predicate of the AllPairs
 * join: decides `cos(A,B) ≥ p/q` as `q²·dot² ≥ p²·‖A‖²·‖B‖²`, computing
 * the merge dot ONCE per candidate inside the expression — as a
 * composed filter over a projected dot column, Catalyst inlines the
 * projection into the join condition and evaluates the merge twice,
 * plus four decimal(38,0) products per row. The threshold test is a
 * double fast-path (relative tolerance 1e-9, ~10⁶× above the
 * accumulated rounding error of three multiplies, so a trusted sign is
 * never wrong) with an exact BigInteger fallback for near-threshold
 * candidates — no double ever decides membership.
 */
object BagCos {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Σ tfA(tid)·tfB(tid) over the id intersection, as long. */
  def packed_bag_dot(a: Column, b: Column): Column =
    column(PackedBagDot(toExpr(a), toExpr(b)))

  /** True iff cos(A,B) ≥ p/q, decided exactly. */
  def packed_bag_cos_ge(a: Column, b: Column, na2: Column, nb2: Column,
      p: Long, q: Long): Column =
    column(PackedBagCosGe(toExpr(a), toExpr(b), toExpr(na2), toExpr(nb2), p, q))

  // containsNull is accepted either way: Spark marks many derived arrays
  // containsNull=true even when no element is ever null at runtime
  // (transform/flatten outputs), so rejecting it would refuse legitimate
  // plans. The packed-bag builders in this repo never emit null elements;
  // a null slot read through getLong would surface as tid/tf 0.
  private[functions] def isPackedBag(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Referenced from generated code. Allocation-free sorted merge. The
    * `i + 1 < na` bounds make a malformed ODD-length array drop its
    * trailing half-pair instead of reading past the array end (getLong
    * on UnsafeArrayData has no bounds check in release JVMs); for
    * well-formed even-length bags the condition is identical to i < na. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var s = 0L
    while (i + 1 < na && j + 1 < nb) {
      val ka = a.getLong(i); val kb = b.getLong(j)
      if (ka == kb) { s += a.getLong(i + 1) * b.getLong(j + 1); i += 2; j += 2 }
      else if (ka < kb) i += 2
      else j += 2
    }
    s
  }

  /** First common element of two ascending long arrays;
    * Long.MIN_VALUE when disjoint (allocation-free — a boxed return
    * would allocate once per joined row, tens of millions per verify
    * stage). Referenced from generated code. */
  def firstCommon(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val ka = a.getLong(i); val kb = b.getLong(j)
      if (ka == kb) return ka
      else if (ka < kb) i += 1
      else j += 1
    }
    Long.MinValue
  }

  /** First common element of two ascending long arrays as a Column
    * (null when disjoint) — the emit-once guard of the AllPairs
    * self-join: accept a joined pair only on its first shared prefix
    * token, so each pair is emitted exactly once. */
  def first_common_long(a: Column, b: Column): Column =
    column(FirstCommonLong(toExpr(a), toExpr(b)))

  /** Referenced from generated code: q²·dot² ≥ p²·na2·nb2, exactly.
    * Zero-norm guard first: cosine is UNDEFINED for an empty/zero bag,
    * and without it the comparison is vacuously 0 ≥ 0 = true — an
    * empty doc would read as "similar" to every counterpart (the dense
    * kernel guards the same edge with dot > 0). Current Dedup call
    * sites can't build empty bags, but this is a public Column API. */
  def ge(dotV: Long, na2: Long, nb2: Long, p: Long, q: Long): Boolean = {
    if (na2 == 0L || nb2 == 0L) return false
    val a = q.toDouble * dotV.toDouble
    val lhs = a * a
    val rhs = p.toDouble * p.toDouble * na2.toDouble * nb2.toDouble
    val tol = 1e-9 * math.max(lhs, rhs)
    if (lhs - rhs > tol) true
    else if (rhs - lhs > tol) false
    else {
      val l = BigInteger.valueOf(q).multiply(BigInteger.valueOf(dotV))
      val r = BigInteger.valueOf(p).multiply(BigInteger.valueOf(p))
        .multiply(BigInteger.valueOf(na2)).multiply(BigInteger.valueOf(nb2))
      l.multiply(l).compareTo(r) >= 0
    }
  }
}

case class FirstCommonLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (BagCos.isPackedBag(left.dataType) && BagCos.isPackedBag(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = BagCos.firstCommon(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (v == Long.MinValue) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // sentinel, not a boxed Long: dictionary tids are non-negative,
      // so MIN_VALUE can never be a real first-common value
      s"""
         |${ev.value} = graft.functions.BagCos.firstCommon($a, $b);
         |${ev.isNull} = (${ev.value} == Long.MIN_VALUE);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "first_common_long"
}

case class PackedBagDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (BagCos.isPackedBag(left.dataType) && BagCos.isPackedBag(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    BagCos.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BagCos.dot($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "packed_bag_dot"
}

case class PackedBagCosGe(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression,
    p: Long, q: Long) extends QuaternaryExpression {

  require(q > 0 && p > 0, "threshold p/q must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (BagCos.isPackedBag(first.dataType) && BagCos.isPackedBag(second.dataType)
        && third.dataType == LongType && fourth.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, long, long), got " +
        s"${children.map(_.dataType.sql).mkString(", ")}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, na2: Any, nb2: Any): Any =
    BagCos.ge(
      BagCos.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]),
      na2.asInstanceOf[Long], nb2.asInstanceOf[Long], p, q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, na2, nb2) =>
      s"""${ev.value} = graft.functions.BagCos.ge(
         |  graft.functions.BagCos.dot($a, $b), $na2, $nb2, ${p}L, ${q}L);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = o)
  override def prettyName: String = "packed_bag_cos_ge"
}
