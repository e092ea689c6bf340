package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a codegen'd Catalyst expression — the
 * canonical-composition pass a text pipeline runs before hashing or
 * deduplicating (decomposed "é" and composed "é" must fingerprint
 * identically). Spark has no built-in normalizer; the JDK's
 * `java.text.Normalizer` implements the Unicode standard, matching other
 * engines' NFC (e.g. utf8proc) on canonical compositions.
 */
object NormalizeFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  def nfc(text: Column): Column = column(NfcNormalize(expr(text)))
}

object NormalizeKernels {
  /** NFC with a fast no-op path: already-normalized ASCII/NFC strings
    * (the overwhelming majority of a real corpus) skip the allocation. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
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
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.nfc(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.NormalizeKernels.nfc($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
