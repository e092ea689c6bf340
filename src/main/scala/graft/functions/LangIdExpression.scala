package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass language-ID heuristic as a native expression: one traversal
 * tokenizes on spaces, counts per-language marker-word hits (hash-set
 * lookup) and CJK codepoints, and emits the best-scoring code or "und".
 * The composable-Catalyst formulation (TextAnalysis.langId) re-scans the
 * token array once per language; at 100 TB those constant factors are
 * real — this kernel is one pass and stays inside codegen via a static
 * call.
 */
object LangIdExpression {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  def fast_lang_id(text: Column): Column = column(FastLangId(expr(text)))

  private[functions] val langs = Array("en", "de", "es", "fr")

  // static result constants: UTF8String is immutable, so sharing is safe
  // (Spark literals do the same) — without these the kernel allocated a
  // fresh UTF8String + backing byte[] per ROW purely for a constant
  // return value, the only per-row allocation left in this hot path
  private val UND = UTF8String.fromString("und")
  private val ZH = UTF8String.fromString("zh")
  private val LANG_CODES: Array[UTF8String] = langs.map(UTF8String.fromString)
  private[functions] val markerSets: Array[java.util.HashSet[String]] = {
    val words = Array(
      Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
      Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
      Seq("el", "la", "los", "las", "es", "y", "de", "que", "en", "por"),
      Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"))
    words.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }
  }

  /** Static kernel (shared by eval and generated code). */
  def classify(text: UTF8String): UTF8String = {
    if (text == null) return UND
    val s = text.toString
    var cjk = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '一' && c <= '鿿') cjk += 1
      i += 1
    }
    val hits = new Array[Int](langs.length)
    var nTokens = 0
    var start = 0
    i = 0
    def consume(from: Int, until: Int): Unit = {
      if (until > from) {
        nTokens += 1
        // Locale.ROOT: the default-locale overload is executor-locale-
        // dependent (tr-TR lowercases "IS" to dotless "ıs", so no en
        // marker would ever match) — a determinism bug, not cosmetics
        val tok = s.substring(from, until).toLowerCase(java.util.Locale.ROOT)
        var l = 0
        while (l < langs.length) {
          if (markerSets(l).contains(tok)) hits(l) += 1
          l += 1
        }
      }
    }
    while (i < s.length) {
      if (s.charAt(i) == ' ') { consume(start, i); start = i + 1 }
      i += 1
    }
    consume(start, s.length)
    val denomT = math.max(1, nTokens).toDouble
    var best = -1
    var bestScore = 0.0
    var l = 0
    while (l < langs.length) {
      val sc = hits(l) / denomT
      if (sc > bestScore) { bestScore = sc; best = l }
      l += 1
    }
    val cjkScore = cjk.toDouble / math.max(1, s.length)
    if (cjkScore > bestScore && cjkScore > 0) ZH
    else if (best >= 0 && bestScore > 0) LANG_CODES(best)
    else UND
  }
}

case class FastLangId(child: Expression) extends UnaryExpression {
  // SQL-registered: a non-string input would CCE at task runtime —
  // fail analysis instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  // eval/doGenCode are written out (NOT nullSafeEval/defineCodeGen):
  // the UnaryExpression defaults null-PROPAGATE before the kernel runs,
  // which with nullable=false hands generated consumers a null they
  // were told cannot happen (UnsafeRowWriter NPEs; constraint inference
  // folds IsNotNull to true). classify() owns the null case: ⇒ "und".
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LangIdExpression.classify(
      child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = graft.functions.LangIdExpression.classify(
          ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "fast_lang_id"
}
