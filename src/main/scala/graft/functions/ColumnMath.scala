package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions.{lit, pmod, round, transform}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** Shared exact integer Column arithmetic (the ONE floor-division
  * definition — RangeJoin and Profile previously each had a private
  * copy, and they disagreed: the Profile form routed `(a - pmod(a,b))/b`
  * through DOUBLE division, whose integer-valued quotient is only exact
  * while the numerator fits in 2^53 — above that (epoch-micros
  * territory) the nearest-double numerator truncates through
  * cast("long") to q-1 for quotients the exact form gets right). */
object ColumnMath {

  /** Exact floor-division for integral columns: `/` rounds through
    * double (loses bits above 2^53); bare DIV truncates toward zero
    * (misbins negatives). `a - pmod(a, w)` is exactly divisible and
    * IntegralDivide stays in longs end-to-end. Null in ⇒ null out. */
  def floorDiv(c: Column, w: Long): Column =
    column(IntegralDivide(
      expression(c - pmod(c, lit(w))), expression(lit(w))))

  /** Scalar HALF_UP round-to-integer on double — bit-equal to Spark's
    * 1-arg `round(c)` ([[HalfUpRound]], KernelPropertySpec pin) without
    * Catalyst Round's two BigDecimal allocations per value. The drop-in
    * for every `round(expr).cast("long")` scaled-integer projection in
    * the gate's hot paths (r15). */
  def roundHalfUp(c: Column): Column =
    column(HalfUpRound(expression(c.cast("double"))))

  /** The canonical scaled-integer vector projection (e7 convention):
    * float elements → round(x·scale) as LONG, HALF_UP via Spark round —
    * the integer currency every exact kernel and every DuckDB oracle
    * replays. ONE definition: seven private copies had grown across six
    * files, and the oracle-parity contract (Evaluation's own warning)
    * breaks the first time one copy drifts by a rounding-mode tweak. */
  def scaledLongs(vec: Column, scale: Long): Column =
    transform(vec, e => round(e.cast("double") * scale).cast("long"))
}
