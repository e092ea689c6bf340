package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (as-of) join — for each left row, attach the right row
 * with the greatest `rightTime <= leftTime` (or strictly `<`) within the
 * same key. The canonical enrichment join for event pipelines ("state of
 * X at the moment Y happened") that Spark has no native operator for.
 *
 * Scale shape: NOT a join at all. Both sides are tagged and unioned, then
 * a single hash repartition by key + one sort-within-partitions feeds a
 * running `last(right_payload, ignoreNulls)` window. The plan is
 * Union -> Exchange(key) -> Sort -> Window -> Filter, i.e. exactly one
 * shuffle whose width is |left| + |right| rows of (key, time, payload) —
 * no range explosion, no per-row right-side probe, no broadcast
 * requirement on either side. At 100 TB this is the same cost as a
 * groupBy over the union; a naive SQL formulation (correlated max or
 * inequality join) degenerates to a per-key quadratic scan.
 *
 * Determinism: among right rows sharing (key, rightTime), the row with
 * the greatest `tieBreak` value wins (pass one whenever right times can
 * collide — without it the pick among exact ties is partition-order
 * dependent, same caveat as any as-of engine).
 */
object AsofJoin {

  /**
   * @param left       rows to enrich; all its columns are carried through
   * @param right      lookup side; only `rightCols` are attached
   * @param key        equi-join key column name, present on both sides
   * @param leftTime   event-time column on `left`
   * @param rightTime  event-time column on `right` (cast to leftTime's type)
   * @param rightCols  right columns to attach (must not collide with left
   *                   column names after `suffix` is applied)
   * @param suffix     appended to attached right column names
   * @param inclusive  true: match rightTime <= leftTime; false: strict <
   *                   (directions flip under `direction = "forward"`)
   * @param tieBreak   right column breaking exact rightTime ties (max wins)
   * @param joinType   "left" keeps unmatched left rows with nulls; "inner"
   *                   drops them
   * @param direction  "backward" (default): greatest rightTime <= leftTime;
   *                   "forward": smallest rightTime >= leftTime — the
   *                   "next event after" enrichment (time-to-conversion,
   *                   next-error-after-deploy); same single-shuffle plan,
   *                   only the traversal order flips
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      suffix: String = "",
      inclusive: Boolean = true,
      tieBreak: Option[String] = None,
      joinType: String = "left",
      direction: String = "backward"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    require(Seq("left", "inner").contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"asofJoin supports left/inner, not '$joinType'")
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward/forward, not '$direction'")
    require(left.columns.contains(key) && left.columns.contains(leftTime),
      s"left side must have '$key' and '$leftTime'")
    require(right.columns.contains(key) && right.columns.contains(rightTime),
      s"right side must have '$key' and '$rightTime'")
    val attached = rightCols.map(_ + suffix)
    val collisions = attached.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"attached right columns collide with left columns: $collisions — use suffix")
    // names are used as column references and struct-field names: a dot
    // would silently resolve as a nested path (wrong column or opaque
    // AnalysisException), so dotted names travel backtick-quoted and
    // fields come back via getField (any name). Backticks themselves
    // cannot be quoted — reject loudly, the Profile convention.
    (left.columns ++ right.columns).foreach(c => require(!c.contains("`"),
      s"column name <$c> contains a backtick - unsupported in asofJoin"))
    def q(c: String): Column = col(s"`$c`")

    val timeType = left.schema(leftTime).dataType
    val lpayType = left.select(struct(left.columns.map(q).toIndexedSeq: _*)).schema.head.dataType
    val rpayType = right.select(struct(rightCols.map(q): _*)).schema.head.dataType
    val tbType = tieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)

    // Sort position of right rows relative to an equal-time left row:
    // before it (0 < 1) when the match is inclusive, after it (2 > 1)
    // when strict — the running last() then in/excludes equal-time rows.
    val rightSide = if (inclusive) 0 else 2

    val lTagged = left.select(
      q(key).as("__k"),
      q(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(q).toIndexedSeq: _*).as("__lpay"),
      lit(null).cast(rpayType).as("__rpay"))
    val rTagged = right.select(
      q(key).as("__k"),
      q(rightTime).cast(timeType).as("__t"),
      lit(rightSide).as("__side"),
      tieBreak.map(q).getOrElse(lit(0L)).cast(tbType).as("__tb"),
      lit(null).cast(lpayType).as("__lpay"),
      struct(rightCols.map(q): _*).as("__rpay"))

    // Forward = the same running-last() over the REVERSED time order:
    // "most recent prior in reverse" is "nearest following". The side
    // constants keep working because equal-time right rows must precede
    // the left row in traversal order exactly when the match is inclusive.
    val tOrder = if (direction == "forward") col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tOrder, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Null-time rows get SQL comparison semantics, not sort-order
    // accidents: a right row with null time sorted FIRST under asc and
    // became a universal fallback match; a left row with null time
    // sorted LAST under forward's desc and picked up the key's minimum.
    // Right nulls can never match (t <= / >= null is never true) so
    // they are dropped; left nulls keep their row with a null match.
    val filled = lTagged.unionByName(rTagged.filter(col("__t").isNotNull))
      .withColumn("__match", when(col("__t").isNotNull,
        last(col("__rpay"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)

    val kept = if (joinType.toLowerCase(java.util.Locale.ROOT) == "inner")
      filled.filter(col("__match").isNotNull) else filled

    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col("__lpay").getField(c).as(c)) ++
        rightCols.map(c => col("__match").getField(c).as(c + suffix))
    kept.select(outCols: _*)
  }
}
