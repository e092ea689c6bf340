package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Integer-exact kernels for the deterministic embedding operators
 * (JL projection, distributed k-means, MaxSim late interaction).
 *
 * The shared primitive is y = M · e7 where e7_p = round(v_p · scale) —
 * computed HERE in one codegen'd pass instead of k separate
 * `zip_with`+`aggregate` chains: Spark's higher-order functions are
 * CodegenFallback (interpreted, per-element boxing, intermediate array
 * allocations), and repeating them k times per row re-evaluates the
 * scaling transform k times. This kernel scales each element once and
 * runs a tight primitive k×dim loop (measured ~10-30× on the gate ops).
 *
 * Rounding matches SQL round() (half away from zero): inputs are
 * float32 values scaled by ≤1e7, so v·scale is an EXACT double (24-bit
 * mantissa × exact power-of-ten product < 2^48) and the branchy
 * floor/ceil formula is identical to decimal HALF_UP in this range.
 */
object IntKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** y_j = Σ_p matrix(j)(p) · round(v_p · scale), as array<long>. */
  def scaled_matmul(v: Column, matrix: Array[Array[Long]], scale: Long): Column =
    column(ScaledIntMatMul(toExpr(v), matrix, scale))
}

/**
 * One-pass integer matmul against a constant long[][] held as a
 * reference object (no literal boxing). Raises on dimension mismatch —
 * silent truncation would corrupt every downstream argmin/argmax.
 */
case class ScaledIntMatMul(
    child: Expression,
    matrix: Array[Array[Long]],
    scale: Long) extends UnaryExpression {
  require(matrix.nonEmpty && matrix.forall(_.length == matrix(0).length),
    "matrix must be rectangular and non-empty")

  // getFloat on non-float32 element storage silently misreads bytes —
  // fail analysis instead of producing garbage projections.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cols = matrix(0).length
    if (x.numElements() != cols) {
      throw new IllegalArgumentException(
        s"vector length ${x.numElements()} != matrix columns $cols")
    }
    val e7 = new Array[Long](cols)
    var p = 0
    while (p < cols) {
      val t = x.getFloat(p).toDouble * scale
      e7(p) = (if (t >= 0) math.floor(t + 0.5d) else math.ceil(t - 0.5d)).toLong
      p += 1
    }
    val out = new Array[Long](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      var s = 0L; var i = 0
      while (i < cols) { s += row(i) * e7(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("intMatrix", matrix, "long[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val cols = ctx.freshName("cols"); val e7 = ctx.freshName("e7")
      val out = ctx.freshName("out"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |int $cols = $m[0].length;
         |if ($x.numElements() != $cols) {
         |  throw new IllegalArgumentException("vector length " +
         |    $x.numElements() + " != matrix columns " + $cols);
         |}
         |long[] $e7 = new long[$cols];
         |for (int $p = 0; $p < $cols; $p++) {
         |  double $t = (double) $x.getFloat($p) * ${scale}L;
         |  $e7[$p] = (long)($t >= 0 ? Math.floor($t + 0.5d) : Math.ceil($t - 0.5d));
         |}
         |long[] $out = new long[$m.length];
         |for (int $j = 0; $j < $m.length; $j++) {
         |  long[] $row = $m[$j];
         |  long $s = 0L;
         |  for (int $i = 0; $i < $cols; $i++) { $s += $row[$i] * $e7[$i]; }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "scaled_int_matmul"
}
