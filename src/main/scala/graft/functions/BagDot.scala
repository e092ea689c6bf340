package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}

/**
 * Exact integer dot product of two term-count bags held as
 * `array<struct<tok: string, tf: long>>` SORTED ascending by `tok`
 * (`sort_array` over `collect_list(struct(tok, tf))` produces exactly
 * this ordering — struct comparison is field-by-field, `tok` first).
 *
 * One O(na+nb) merge per row in whole-stage codegen. The declarative
 * alternative — `aggregate(map_values(map_zip_with(...)))` — is a
 * CodegenFallback chain that builds a key-union map per row with
 * per-key linear probes: O((na+nb)²) comparisons plus boxed
 * intermediate maps. Measured on the 12M-candidate all-pairs gate join
 * at sf0.1: the HOF chain runs ~150 s, this kernel makes the whole
 * operator ~20× cheaper. No hashing of tokens — string merge keeps the
 * dot EXACT (a 64-bit token hash would make "exact similarity ≥ t"
 * silently probabilistic).
 */
object BagDot {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Σ tfA(tok)·tfB(tok) over the token intersection, as long. */
  def sorted_bag_dot(a: Column, b: Column): Column =
    column(SortedBagDot(toExpr(a), toExpr(b)))
}

case class SortedBagDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isBag(dt: DataType): Boolean = dt match {
    case ArrayType(s: StructType, _) =>
      s.length == 2 && s(0).dataType == StringType && s(1).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isBag(left.dataType) && isBag(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<string,long>> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val na = xa.numElements(); val nb = xb.numElements()
    var i = 0; var j = 0; var s = 0L
    while (i < na && j < nb) {
      val ra = xa.getStruct(i, 2); val rb = xb.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c == 0) { s += ra.getLong(1) * rb.getLong(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val ra = ctx.freshName("ra"); val rb = ctx.freshName("rb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $na && $j < $nb) {
         |  org.apache.spark.sql.catalyst.InternalRow $ra = $a.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow $rb = $b.getStruct($j, 2);
         |  int $c = $ra.getUTF8String(0).compareTo($rb.getUTF8String(0));
         |  if ($c == 0) { $s += $ra.getLong(1) * $rb.getLong(1); $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "sorted_bag_dot"
}
