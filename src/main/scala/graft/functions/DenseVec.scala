package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Exact kernels over DENSE scaled-integer vectors (`array<bigint>` of
 * `e7 = round(v·scale)` elements, one per dimension) — the dense twin
 * of [[BagCos]]'s sorted-bag kernels. Shared by the semantic-dedup
 * pair verify, where the threshold decision must be a pure function of
 * the data (no float sum-order or comparison nondeterminism).
 *
 * [[DenseCosGe]] decides `cos(A,B) ≥ p/q` as
 * `dot > 0 ∧ q²·dot² ≥ p²·‖A‖²·‖B‖²` — the sign guard matters here and
 * NOT in the bag kernels: term frequencies are non-negative so a bag
 * dot can never be negative, but dense embedding dots can, and squaring
 * a negative dot would pass the magnitude test with cos < 0. The
 * magnitude test reuses [[BagCos.ge]]'s double fast-path + BigInteger
 * fallback — no double ever decides membership.
 */
object DenseVec {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Σ a_i·b_i over dense long arrays (raises on length mismatch). */
  def dense_dot(a: Column, b: Column): Column =
    column(DenseLongDot(toExpr(a), toExpr(b)))

  /** True iff cos(A,B) ≥ p/q, decided exactly (sign-aware). */
  def dense_cos_ge(a: Column, b: Column, na2: Column, nb2: Column,
      p: Long, q: Long): Column =
    column(DenseCosGe(toExpr(a), toExpr(b), toExpr(na2), toExpr(nb2), p, q))

  /** Sign-bit binary signature of an `array<float>` (dim ≤ 64): bit i
    * set iff v_i > 0 — the 64×-compression binary quantization whose
    * Hamming distance approximates angular distance. */
  def sign_bits64(v: Column): Column = column(SignBits64(toExpr(v)))

  /** Driver-side twin of [[sign_bits64]] for query vectors. */
  def signBitsLocal(v: Array[Float]): Long = {
    require(v.length <= 64, s"sign_bits64 requires dim <= 64, got ${v.length}")
    var sig = 0L; var i = 0
    while (i < v.length) { if (v(i) > 0f) sig |= (1L << i); i += 1 }
    sig
  }

  private[functions] def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Referenced from generated code. Tight primitive loop, no boxing.
    * Length mismatch raises — a silently truncated dot corrupts every
    * downstream threshold decision. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"dense_dot length mismatch: $n vs ${b.numElements()}")
    }
    var i = 0; var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Referenced from generated code: sign guard + exact magnitude test. */
  def geSigned(dotV: Long, na2: Long, nb2: Long, p: Long, q: Long): Boolean =
    dotV > 0 && BagCos.ge(dotV, na2, nb2, p, q)
}

case class SignBits64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > 64) throw new IllegalArgumentException(
      s"$prettyName requires dim <= 64, got $n")
    var sig = 0L; var i = 0
    while (i < n) { if (x.getFloat(i) > 0f) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = $x.numElements();
         |if ($n > 64) throw new IllegalArgumentException(
         |  "sign_bits64 requires dim <= 64, got " + $n);
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getFloat($i) > 0f) ${ev.value} |= (1L << $i);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "sign_bits64"
}

case class DenseLongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (DenseVec.isLongArray(left.dataType) && DenseVec.isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    DenseVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DenseVec.dot($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "dense_long_dot"
}

case class DenseCosGe(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression,
    p: Long, q: Long) extends QuaternaryExpression {

  require(q > 0 && p > 0, "threshold p/q must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (DenseVec.isLongArray(first.dataType) && DenseVec.isLongArray(second.dataType)
        && third.dataType == LongType && fourth.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, long, long), got " +
        s"${children.map(_.dataType.sql).mkString(", ")}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, na2: Any, nb2: Any): Any =
    DenseVec.geSigned(
      DenseVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]),
      na2.asInstanceOf[Long], nb2.asInstanceOf[Long], p, q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, na2, nb2) =>
      s"""${ev.value} = graft.functions.DenseVec.geSigned(
         |  graft.functions.DenseVec.dot($a, $b), $na2, $nb2, ${p}L, ${q}L);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = o)
  override def prettyName: String = "dense_cos_ge"
}
