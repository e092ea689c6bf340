package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character-trigram kernels for the corpus LM typicality score
 * (`TextAnalysis.lmScore`).
 *
 * A trigram of Unicode codepoints packs bijectively into one long
 * (3 × 21 bits), so corpus counting shuffles 8-byte keys instead of
 * 3-char string objects, and the scoring pass probes a sorted long array
 * with binary search — per-DOCUMENT expression calls with a tight loop
 * inside, no explode, no join, no per-gram allocation.
 */
object LmFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  /** Packed codepoint-trigram keys of a (pre-lowercased) string; one long
    * per gram, length = numChars - 2. */
  def trigram_keys(text: Column): Column = column(TrigramKeys(expr(text)))

  /** Per-doc LM stats against a driver-built vocabulary:
    * struct(sum_millinats, n_rare, n_grams). `keys` must be sorted;
    * `packed(i)` = (millinats << 1) | rareBit for keys(i). */
  def lm_doc_score(text: Column, keys: Array[Long], packed: Array[Long]): Column =
    column(LmDocScore(expr(text), keys, packed))

  /** OOV-tolerant variant for CROSS-corpus scoring: vocabulary misses
    * contribute ln(1)=0 milli-nats and count as OOV instead of
    * throwing. struct(sum_millinats, n_oov, n_grams). */
  def lm_doc_cross_score(text: Column, keys: Array[Long],
      millinats: Array[Long]): Column =
    column(LmDocCrossScore(expr(text), keys, millinats))
}

/** Static kernels shared by interpreted eval and generated code. */
object LmKernels {

  /** Codepoints of `s` packed 21-bit left-to-right: cp0<<42|cp1<<21|cp2. */
  def trigramKeys(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var i = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(i) = cp
      i += 1
      off += Character.charCount(cp)
    }
    val out = new Array[Long](n - 2)
    var j = 0
    while (j < n - 2) {
      out(j) = (cps(j).toLong << 42) | (cps(j + 1).toLong << 21) | cps(j + 2).toLong
      j += 1
    }
    new GenericArrayData(out)
  }

  def score(s: UTF8String, keys: Array[Long], packed: Array[Long]): Any = {
    val grams = trigramKeys(s)
    val n = grams.numElements()
    if (n == 0) return null // mirrors the length >= 3 filter
    var sum = 0L
    var rare = 0L
    var j = 0
    while (j < n) {
      val k = grams.getLong(j)
      val idx = java.util.Arrays.binarySearch(keys, k)
      // every gram of every doc is in the corpus vocabulary by
      // construction; a miss means the vocabulary wasn't built from
      // this corpus — fail loudly rather than skew the score
      if (idx < 0) throw new IllegalStateException(
        s"trigram key $k missing from LM vocabulary (stale vocab?)")
      val p = packed(idx)
      sum += (p >>> 1)
      rare += (p & 1L)
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sum, rare, n.toLong))
  }
}

object LmCrossKernels {
  /** Like [[LmKernels.score]] but a vocabulary miss is DATA, not a bug:
    * unseen grams score ln(1)=0 and count as OOV — the cross-corpus
    * contract (the vocab comes from a DIFFERENT corpus). */
  def score(s: UTF8String, keys: Array[Long], millinats: Array[Long]): Any = {
    val grams = LmKernels.trigramKeys(s)
    val n = grams.numElements()
    if (n == 0) return null // mirrors the length >= 3 filter
    var sum = 0L
    var oov = 0L
    var j = 0
    while (j < n) {
      val idx = java.util.Arrays.binarySearch(keys, grams.getLong(j))
      if (idx < 0) oov += 1L
      else sum += millinats(idx)
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sum, oov, n.toLong))
  }
}

case class LmDocCrossScore(child: Expression, keys: Array[Long],
    millinats: Array[Long])
    extends UnaryExpression {
  // analysis-time guard (HashTypeChecks house rule): a wrong input type
  // must fail analysis, not ClassCastException mid-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    HashTypeChecks.string(child.dataType, prettyName)

  override def dataType: DataType = StructType(Seq(
    StructField("sum_millinats", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    LmCrossKernels.score(a.asInstanceOf[UTF8String], keys, millinats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ks = ctx.addReferenceObj("lmXVocabKeys", keys, "long[]")
    val ms = ctx.addReferenceObj("lmXVocabMillinats", millinats, "long[]")
    val resultType = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    nullSafeCodeGen(ctx, ev, x =>
      s"""Object r = graft.functions.LmCrossKernels.score($x, $ks, $ms);
         |if (r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ($resultType) r;
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lm_doc_cross_score"
}

case class TrigramKeys(child: Expression) extends UnaryExpression {
  // analysis-time guard (HashTypeChecks house rule): a wrong input type
  // must fail analysis, not ClassCastException mid-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    HashTypeChecks.string(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    LmKernels.trigramKeys(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.LmKernels.trigramKeys($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "trigram_keys"
}

case class LmDocScore(child: Expression, keys: Array[Long], packed: Array[Long])
    extends UnaryExpression {
  // analysis-time guard (HashTypeChecks house rule): a wrong input type
  // must fail analysis, not ClassCastException mid-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    HashTypeChecks.string(child.dataType, prettyName)

  override def dataType: DataType = StructType(Seq(
    StructField("sum_millinats", LongType, nullable = false),
    StructField("n_rare", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))
  // short docs (< 3 chars) yield null and are filtered by the caller
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    LmKernels.score(a.asInstanceOf[UTF8String], keys, packed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ks = ctx.addReferenceObj("lmVocabKeys", keys, "long[]")
    val ps = ctx.addReferenceObj("lmVocabPacked", packed, "long[]")
    val resultType = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    nullSafeCodeGen(ctx, ev, x =>
      s"""Object r = graft.functions.LmKernels.score($x, $ks, $ps);
         |if (r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ($resultType) r;
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lm_doc_score"
}
