package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native int8-quantization kernels — the codegen replacement for the
 * `transform(vec, round(x / scale))` column chain that previously built
 * `Quantize.quantize`'s qvec/qscale columns.
 *
 * Why: `transform()` higher-order lambdas are NOT whole-stage-codegen'd
 * (Spark evaluates the lambda interpreted, per element), and Catalyst's
 * `Round` on double routes every element through
 * `BigDecimal(shortest-decimal rendering).setScale(0, HALF_UP)` — ~100 ns
 * and two allocations per element. At 10M×1536 that chain dominated the
 * q8 slab build (SURVEY r15 item 15: datagen+quantize 284 s vs 246 s for
 * everything else). These expressions run the allocation-free HALF_UP
 * form property-pinned against Spark's `Round` in KernelPropertySpec
 * ("fast HALF_UP ... == Spark's Round", 7k cases incl. the two broken
 * fast forms the pin exists to keep out), so outputs are bit-identical
 * to the old chain and every committed DuckDB oracle is untouched.
 *
 * Semantics reproduced exactly from the r14 column chain (pinned in
 * QuantizeKernelSpec against a frozen copy of that chain):
 *  - scale = array_max(transform(v, abs(double(x)))) / 127.0:
 *    null-skipping max, NaN-greatest, null for empty/all-null arrays;
 *  - qvec = when(scale = 0, zeros) otherwise round(double(x)/scale)::int:
 *    the zero branch maps EVERY slot (null elements included) to 0; the
 *    quantize branch maps null elements (and a null scale) to null and
 *    raises on a non-finite or int-overflowing quotient exactly where
 *    the old chain's ANSI `cast(int)` raised.
 */
object QuantizeKernels {

  /** max |xᵢ| / 127 over non-null elements; null for empty/all-null.
    * Math.max propagates NaN, matching array_max's NaN-greatest double
    * ordering; abs() leaves no -0.0 for the one case where they differ. */
  def maxAbsScale(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var m = 0.0
    var found = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = Math.abs(a.getFloat(i).toDouble)
        if (found) m = Math.max(m, d) else { m = d; found = true }
      }
      i += 1
    }
    if (found) java.lang.Double.valueOf(m / 127.0) else null
  }

  /** HALF_UP on |y| with the sign restored — bit-equal to Catalyst's
    * `Round(y, 0)` on double (KernelPropertySpec pin): a − floor(a) is
    * exact for a ≥ 0, and the shortest-decimal rendering Round compares
    * through round-trips uniquely, so the 0.5 compare agrees. NaN/±Inf
    * pass through like Round's non-finite guard. */
  def halfUp(y: Double): Double = {
    val a = Math.abs(y)
    val f = Math.floor(a)
    val r = Math.copySign(if (a - f >= 0.5) f + 1 else f, y)
    // Round's BigDecimal path never yields -0.0 (y in (-0.5, -0.0]
    // rounds to POSITIVE zero); NaN/±Inf fall through (r == 0.0 false)
    if (r == 0.0) 0.0 else r
  }

  private def castFail(q: Double): Nothing =
    throw new ArithmeticException(
      s"quantize: rounded value $q cannot be cast to int " +
        "(non-finite or out of range - matches the ANSI cast the column chain used)")

  private def toIntChecked(q: Double): Int =
    if (java.lang.Double.isNaN(q) || q < Int.MinValue.toDouble || q > Int.MaxValue.toDouble)
      castFail(q)
    else q.toInt

  /** The qvec kernel. `scaleNull` carries SQL null (round(x/NULL) is a
    * NULL element, not a null array — the old chain's `when` fell through
    * to the quantize branch on a null scale). */
  def quantizeArr(v: ArrayData, scaleNull: Boolean, scale: Double): ArrayData = {
    val n = v.numElements()
    if (scaleNull) {
      new GenericArrayData(new Array[Any](n)) // every element NULL
    } else if (scale == 0.0) {
      UnsafeArrayData.fromPrimitiveArray(new Array[Int](n)) // every slot 0
    } else {
      var hasNull = false
      var i = 0
      while (i < n && !hasNull) {
        if (v.isNullAt(i)) hasNull = true
        i += 1
      }
      if (!hasNull) {
        val out = new Array[Int](n)
        i = 0
        while (i < n) {
          out(i) = toIntChecked(halfUp(v.getFloat(i).toDouble / scale))
          i += 1
        }
        UnsafeArrayData.fromPrimitiveArray(out)
      } else {
        val out = new Array[Any](n)
        i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            out(i) = toIntChecked(halfUp(v.getFloat(i).toDouble / scale))
          }
          i += 1
        }
        new GenericArrayData(out)
      }
    }
  }
}

/** Per-vector symmetric int8 scale: `max|xᵢ| / 127` over an array<float>
  * column; null for empty/all-null arrays (the column-chain convention
  * `Quantize.quantize` has always emitted). */
case class MaxAbsScaleF32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    QuantizeKernels.maxAbsScale(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("boxedScale")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${childGen.isNull}) {
        java.lang.Double $boxed =
          graft.functions.QuantizeKernels.maxAbsScale(${childGen.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "max_abs_scale_f32"
}

/** `round(double(xᵢ) / scale)::int` per element with the zero-scale →
  * all-zeros branch folded in; see [[QuantizeKernels.quantizeArr]] for
  * the exact old-chain null/error semantics this reproduces. */
case class QuantizeArrF32(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, double) inputs, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = left.nullable
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val s = right.eval(input)
      QuantizeKernels.quantizeArr(
        v.asInstanceOf[ArrayData],
        s == null,
        if (s == null) 0.0 else s.asInstanceOf[Double])
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = left.genCode(ctx)
    val sGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${vGen.code}
      ${sGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${vGen.isNull}) {
        ${ev.isNull} = false;
        ${ev.value} = graft.functions.QuantizeKernels.quantizeArr(
          ${vGen.value}, ${sGen.isNull}, ${sGen.value});
      }
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "quantize_arr_f32"
}

/**
 * Scalar HALF_UP round-to-integer on double — the codegen drop-in for
 * Catalyst's `Round(x, 0)` in the gate's hot scaled-integer
 * projections (`round(col·100).cast("long")` appears in every
 * cents-exact aggregate, profiler and window entry). Catalyst's Round
 * routes each value through `BigDecimal(shortest rendering).setScale(0,
 * HALF_UP)` — ~100-150 ns and two allocations per value; this is the
 * allocation-free form already property-pinned bit-equal to Round in
 * KernelPropertySpec ([[QuantizeKernels.halfUp]]: NaN/±Inf pass
 * through exactly like Round's non-finite guard), so results — and
 * every committed DuckDB oracle replaying `round(x)` — are unchanged.
 */
case class HalfUpRound(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${other.sql} - cast explicitly")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    QuantizeKernels.halfUp(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.QuantizeKernels.halfUp($x)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "half_up_round"
}
