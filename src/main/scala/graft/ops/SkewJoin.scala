package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted join for skewed keys — the standard remedy when one join key
 * carries a disproportionate share of rows and a plain shuffle join
 * stalls on a single straggler task.
 *
 * Left (skewed, large) rows get a random salt in [0, saltFactor); right
 * (smaller) rows are replicated once per salt value. The join key becomes
 * (key, salt), spreading each hot key over `saltFactor` tasks. AQE's
 * skew-join handles moderate skew automatically; explicit salting is the
 * tool when a single key exceeds what AQE can split (e.g. a null-ish
 * default key holding 30% of 100 TB).
 */
object SkewJoin {

  /** Join types where replicating the right side is semantics-preserving.
    * right_outer / full_outer would emit each UNMATCHED right row once per
    * salt replica (saltFactor duplicates) — silently wrong, so rejected. */
  private val SupportedJoinTypes =
    Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(SupportedJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"saltedJoin supports inner/cross/left joins only, not '$joinType': " +
      "replicated right rows would duplicate unmatched right-side output")
    // the op family's collision convention (AsofJoin/FuzzyJoin/
    // RangeJoin): fail loudly rather than silently overwrite a caller's
    // column and then drop it from the output
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val salted = left.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
