package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}
import org.apache.spark.sql.types._

/** Analysis-time input checks: getFloat/getInt on differently-typed
  * element storage silently misreads bytes (array<double> read as
  * array<float> yields garbage codes with no exception) — the same
  * hazard `ScaledIntMatMul` guards against. */
private[functions] object PqTypeChecks {
  def floatArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<float> input, got ${other.sql}")
  }
  def intArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<int> input, got ${other.sql}")
  }
  def encStruct(dt: DataType, fn: String): TypeCheckResult = dt match {
    case StructType(Array(c, d))
        if c.dataType == IntegerType &&
          intArray(d.dataType, fn) == TypeCheckResult.TypeCheckSuccess =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires struct<cell: int, code: array<int>> input, got ${other.sql}")
  }
}

/**
 * Product-quantization kernels. A PQ code is `m` small integers (one
 * centroid index per subspace), so a d=1536 float32 embedding (6 KB)
 * compresses to m bytes — the 64×-compression tier beyond int8, the
 * standard billion-vector first-pass representation (Jégou et al.,
 * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
 * public literature; the reference scores exact float32 only,
 * `/root/reference/vector.go:14-26`).
 *
 * Both kernels are Catalyst expressions with codegen; the codebook /
 * lookup table ships as a reference object inside the serialized
 * expression (no driver-side static registry), so the same plan works on
 * a real cluster.
 *
 * All arithmetic is DOUBLE with fixed iteration order, so an external
 * engine can replay encode and scoring bit-for-bit.
 */
object PqFunctions {

  /** Encode a float-array column into `m` centroid indices.
    * `codebook` is flat `[m][k][subDim]` row-major doubles. */
  def pq_encode(vec: Column, codebook: Array[Double], m: Int, k: Int, subDim: Int): Column =
    column(PqEncode(expr(vec), codebook, m, k, subDim))

  /** Asymmetric-distance score: Σ_j table[j][code_j] with `table` flat
    * `[m][k]` (per-subspace query·centroid dot products). */
  def pq_adc(code: Column, table: Array[Double], m: Int, k: Int): Column =
    column(PqAdc(expr(code), table, m, k))

  /** Fused IVF-PQ encode: cell = argmax dot against `cells` (flat
    * `[nlist][dim]`), then PQ-encode the residual v − cell_centroid.
    * Returns struct(cell int, code array<int>). */
  def ivfpq_encode(vec: Column, cells: Array[Double], nlist: Int,
      codebook: Array[Double], m: Int, k: Int, subDim: Int): Column =
    column(IvfPqEncode(expr(vec), cells, nlist, codebook, m, k, subDim))

  /** IVF-PQ ADC score: cellDots[cell] + Σ_j table[j][code_j] — the
    * query·cell-centroid part plus the residual lookup sum, added in
    * that fixed order. */
  def ivfpq_adc(enc: Column, cellDots: Array[Double],
      table: Array[Double], m: Int, k: Int): Column =
    column(IvfPqAdc(expr(enc), cellDots, table, m, k))
}

/** Static kernels shared by interpreted eval and generated code. */
object PqKernels {

  /** THE nearest-centroid subspace argmin — the one copy both [[encode]]
    * and [[ivfpqEncode]] run, so PQ and IVF-PQ codes can never
    * desynchronize (the bit-for-bit external-replay guarantee depends on
    * a single kernel). Squared-L2 in double, ascending element order,
    * strict `<` ⇒ first minimum wins (matches
    * `list_position(dists, list_min(dists))` replay semantics). */
  private def nearestCodes(
      x: Array[Double], cb: Array[Double], m: Int, k: Int,
      subDim: Int): Array[Int] = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var i = 0
        val off = (j * k + c) * subDim
        while (i < subDim) {
          val diff = x(j * subDim + i) - cb(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }

  /** Nearest-centroid index per subspace (see [[nearestCodes]]). The
    * float32 input is widened to double ONCE up front — the same values
    * the inline `getFloat(...).toDouble` read produced, with k fewer
    * virtual reads per element. */
  def encode(v: ArrayData, cb: Array[Double], m: Int, k: Int, subDim: Int): ArrayData = {
    val n = v.numElements()
    if (n != m * subDim) {
      throw new IllegalArgumentException(
        s"vector length $n does not match m*subDim = ${m * subDim}")
    }
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
    new GenericArrayData(nearestCodes(x, cb, m, k, subDim))
  }

  /** ADC lookup sum: per-subspace table entries added in subspace order. */
  def adc(code: ArrayData, table: Array[Double], m: Int, k: Int): Double = {
    if (code.numElements() != m) {
      throw new IllegalArgumentException(
        s"code length ${code.numElements()} does not match m = $m")
    }
    var s = 0.0
    var j = 0
    while (j < m) { s += table(j * k + code.getInt(j)); j += 1 }
    s
  }

  /** Cell argmax (double dot, strict > ⇒ first maximum wins), residual in
    * double, then the standard PQ encode of the residual. */
  def ivfpqEncode(v: ArrayData, cells: Array[Double], nlist: Int,
      cb: Array[Double], m: Int, k: Int,
      subDim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = m * subDim
    val n = v.numElements()
    if (n != dim) {
      throw new IllegalArgumentException(
        s"vector length $n does not match m*subDim = $dim")
    }
    var cell = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      var s = 0.0; var i = 0
      val off = c * dim
      while (i < dim) { s += v.getFloat(i).toDouble * cells(off + i); i += 1 }
      if (s > bestS) { bestS = s; cell = c }
      c += 1
    }
    val res = new Array[Double](dim)
    val coff = cell * dim
    var i = 0
    while (i < dim) { res(i) = v.getFloat(i).toDouble - cells(coff + i); i += 1 }
    val code = nearestCodes(res, cb, m, k, subDim)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cell, new GenericArrayData(code)))
  }

  /** cellDots[cell] + residual ADC, in that order. */
  def ivfpqAdc(enc: org.apache.spark.sql.catalyst.InternalRow,
      cellDots: Array[Double], table: Array[Double], m: Int, k: Int): Double =
    cellDots(enc.getInt(0)) + adc(enc.getArray(1), table, m, k)
}

case class PqEncode(child: Expression, codebook: Array[Double], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqTypeChecks.floatArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    PqKernels.encode(a.asInstanceOf[ArrayData], codebook, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      x => s"graft.functions.PqKernels.encode($x, $cb, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_encode"
}

case class PqAdc(child: Expression, table: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqTypeChecks.intArray(child.dataType, prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], table, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pqTable", table, "double[]")
    defineCodeGen(ctx, ev, x => s"graft.functions.PqKernels.adc($x, $t, $m, $k)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_adc"
}

case class IvfPqEncode(child: Expression, cells: Array[Double], nlist: Int,
    codebook: Array[Double], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqTypeChecks.floatArray(child.dataType, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("code", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullSafeEval(a: Any): Any =
    PqKernels.ivfpqEncode(a.asInstanceOf[ArrayData], cells, nlist, codebook, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ce = ctx.addReferenceObj("ivfpqCells", cells, "double[]")
    val cb = ctx.addReferenceObj("ivfpqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.PqKernels.ivfpqEncode($x, $ce, $nlist, $cb, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "ivfpq_encode"
}

case class IvfPqAdc(child: Expression, cellDots: Array[Double],
    table: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqTypeChecks.encStruct(child.dataType, prettyName)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    PqKernels.ivfpqAdc(a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
      cellDots, table, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cd = ctx.addReferenceObj("ivfpqCellDots", cellDots, "double[]")
    val t = ctx.addReferenceObj("ivfpqTable", table, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.PqKernels.ivfpqAdc($x, $cd, $t, $m, $k)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "ivfpq_adc"
}
