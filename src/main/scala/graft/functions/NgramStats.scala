package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document word-n-gram statistics as single codegen-friendly
 * expressions. The Gopher repetition filters (Rae et al. 2021 §A1.2) are
 * PER-DOCUMENT statistics — no cross-document state — so the correct
 * 100 TB shape is one pass over each row inside the scan projection,
 * not an explode of every gram into a corpus-wide aggregate: the
 * explode formulation shuffles O(tokens·|ns|) gram rows per document
 * and pays interpreted higher-order-function evaluation per gram
 * (measured: the whole-operator cost at sf0.1 drops ~5× moving to
 * these expressions, and the exchange disappears entirely).
 *
 * Both expressions codegen to one static call per row (the per-row
 * work is a tight hash-count loop over that document's grams, which
 * Janino-inlined branch code would not beat), so the enclosing
 * projection stays inside WholeStageCodegen.
 */
object NgramStats {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Most frequent word n-gram of one document: struct<gram, cnt>, ties
    * to the lexicographically smallest gram; null when the doc has fewer
    * than n tokens. */
  def top_ngram_stats(toks: Column, n: Column): Column =
    column(TopNgramStats(toExpr(toks), toExpr(n)))

  /** Duplicate-n-gram span coverage of one document:
    * struct<n_tokens, token_chars, covered_tokens, covered_chars> where
    * covered = union of spans of grams occurring ≥2× in the doc. */
  def dup_ngram_stats(toks: Column, n: Column): Column =
    column(DupNgramStats(toExpr(toks), toExpr(n)))

  /** Lexical diversity counters of one document:
    * struct<n_tokens, n_distinct, n_hapax> — the type-token /
    * hapax-legomenon signal, one hash-count pass per row. */
  def lexical_stats(toks: Column): Column =
    column(LexicalStats(toExpr(toks)))

  // UTF8String is immutable — one shared separator instead of a fresh
  // allocation per gram in the per-row hot kernel
  private val GramSep = UTF8String.fromString(" ")

  private def gram(toks: ArrayData, i: Int, n: Int): UTF8String = {
    if (n == 1) {
      val t = toks.getUTF8String(i)
      if (t == null) UTF8String.EMPTY_UTF8 else t
    } else {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        val t = toks.getUTF8String(i + k)
        parts(k) = if (t == null) UTF8String.EMPTY_UTF8 else t
        k += 1
      }
      UTF8String.concatWs(GramSep, parts: _*)
    }
  }

  // n < 1 would otherwise surface as a NegativeArraySizeException deep
  // in gram() (n < 0) or a nonsense all-empty-gram result (n == 0)
  private def checkN(n: Int): Unit =
    if (n < 1) throw new IllegalArgumentException(s"ngram n must be >= 1, got $n")

  /** Referenced from generated code. */
  def topNgramEval(toks: ArrayData, n: Int): InternalRow = {
    checkN(n)
    val m = toks.numElements() - n + 1
    if (m <= 0) return null
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    var i = 0
    while (i < m) {
      counts.merge(gram(toks, i, n), 1, Integer.sum _)
      i += 1
    }
    var best: UTF8String = null
    var bestCnt = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(best) < 0)) {
        best = e.getKey; bestCnt = c
      }
    }
    new GenericInternalRow(Array[Any](best, bestCnt.toLong))
  }

  /** Referenced from generated code. */
  def dupNgramEval(toks: ArrayData, n: Int): InternalRow = {
    checkN(n)
    val t = toks.numElements()
    val m = t - n + 1
    var tokenChars = 0L
    var i = 0
    while (i < t) {
      val tok = toks.getUTF8String(i)
      if (tok != null) tokenChars += tok.numChars()
      i += 1
    }
    if (m <= 0)
      return new GenericInternalRow(Array[Any](t.toLong, tokenChars, 0L, 0L))
    // build each gram ONCE (the coverage pass used to rebuild and rehash
    // all m grams a second time — doubled hash+concat work per row)
    val grams = new Array[UTF8String](m)
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    i = 0
    while (i < m) {
      grams(i) = gram(toks, i, n)
      counts.merge(grams(i), 1, Integer.sum _)
      i += 1
    }
    val covered = new Array[Boolean](t)
    i = 0
    while (i < m) {
      if (counts.get(grams(i)) >= 2) {
        var k = i
        while (k < i + n) { covered(k) = true; k += 1 }
      }
      i += 1
    }
    var coveredTokens = 0L
    var coveredChars = 0L
    i = 0
    while (i < t) {
      if (covered(i)) {
        coveredTokens += 1
        val tok = toks.getUTF8String(i)
        if (tok != null) coveredChars += tok.numChars()
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](t.toLong, tokenChars, coveredTokens, coveredChars))
  }
}

/** Referenced from generated code — a distinct name from the
  * LexicalStats expression class: a companion object method gets NO
  * static forwarder when the class has a conflicting `eval`, so
  * generated Java would resolve to the instance method and fail to
  * compile (observed as a silent interpreted fallback). */
object LexicalKernel {
  def eval(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      counts.merge(if (t == null) UTF8String.EMPTY_UTF8 else t, 1,
        Integer.sum _)
      i += 1
    }
    var hapax = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { if (it.next() == 1) hapax += 1 }
    new GenericInternalRow(
      Array[Any](n.toLong, counts.size.toLong, hapax))
  }
}

case class LexicalStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType), StructField("n_distinct", LongType),
    StructField("n_hapax", LongType)))
  override def nullSafeEval(toks: Any): Any =
    LexicalKernel.eval(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.functions.LexicalKernel.eval($toks);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "lexical_stats"
}

private[functions] trait NgramStatsExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got ${l.sql} and ${r.sql}")
  }

  protected def evalMethod: String

  /** True iff the kernel itself can return null (TopNgramStats' "fewer
    * than n tokens" rule). Only then may the generated code assign
    * `ev.isNull`: with non-nullable children and nullable=false,
    * nullSafeCodeGen's ev.isNull is the FalseLiteral constant, and an
    * assignment to it is invalid Java — Janino fails and the WHOLE
    * stage silently falls back to interpreted execution (the defect
    * class LexicalKernel's scaladoc documents). */
  protected def kernelNullable: Boolean

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) => {
      val call =
        s"""
           |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
           |  graft.functions.NgramStats.$evalMethod($toks, $n);
         """.stripMargin
      if (kernelNullable) call + s"\n${ev.isNull} = (${ev.value} == null);"
      else call
    })
}

case class TopNgramStats(left: Expression, right: Expression)
    extends NgramStatsExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType), StructField("cnt", LongType)))
  override def nullable: Boolean = true
  override protected def evalMethod: String = "topNgramEval"
  override protected def kernelNullable: Boolean = true
  override def nullSafeEval(toks: Any, n: Any): Any =
    NgramStats.topNgramEval(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "top_ngram_stats"
}

case class DupNgramStats(left: Expression, right: Expression)
    extends NgramStatsExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType), StructField("token_chars", LongType),
    StructField("covered_tokens", LongType),
    StructField("covered_chars", LongType)))
  override protected def evalMethod: String = "dupNgramEval"
  override protected def kernelNullable: Boolean = false
  override def nullSafeEval(toks: Any, n: Any): Any =
    NgramStats.dupNgramEval(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "dup_ngram_stats"
}
