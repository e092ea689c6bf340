package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Bloom-filter membership probe as a codegen expression — the map-side
 * pre-filter that lets a 100 TB batch skip the exact-verification join
 * for rows that are PROVABLY absent from a corpus (a Bloom filter has
 * no false negatives). The driver-built filter ships once per executor
 * as a reference object (MBs for 10⁸ items at 1% fpp), and the probe
 * is a handful of hash-bit tests per row inside whole-stage codegen —
 * no UDF, no shuffle.
 */
object BloomFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => expr}

  /** True iff `hash` (long) might be in `bf`; false ⇒ definitely absent. */
  def might_contain_long(hash: Column, bf: BloomFilter): Column =
    column(BloomMightContainLong(expr(hash), bf))
}

case class BloomMightContainLong(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  // analysis-time guard (HashTypeChecks house rule): a wrong input type
  // must fail analysis, not ClassCastException mid-task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    HashTypeChecks.long(child.dataType, prettyName)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any): Any =
    bf.mightContainLong(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, x => s"$ref.mightContainLong($x)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "might_contain_long"
}
