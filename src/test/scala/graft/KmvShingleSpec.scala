package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bit-identity pin for the r15 fused gram-hash kernel
 * ([[graft.functions.KmvShingleHash60]]) against a FROZEN copy of the
 * chain it replaced in `Dedup.corpusSketchKmv` (verbatim from the r14
 * code: `explode(shingles(text, n))` → `kmvHash60(gram)`). The
 * committed dedup_overlap_kmv / dedup_overlap_kmv_stored DuckDB oracles
 * replay THAT chain's gram rendering and hash, so the kernel must
 * reproduce its multiset of hashes exactly — including the <n-token
 * single-gram fallback, empty strings, repeated separators, and
 * non-ASCII case mapping (which stays in Catalyst's own lower()).
 */
class KmvShingleSpec extends SparkSuite {
  import spark.implicits._
  import graft.functions.KmvDistinct

  // ---- the frozen pre-kernel chain (verbatim from r14 Dedup.scala) ----
  private def tokensOld(textCol: Column): Column = split(lower(textCol), " ")
  private def shinglesOld(textCol: Column, n: Int): Column = {
    val toks = tokensOld(textCol)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  private def oldHashes(df: DataFrame, n: Int): Seq[(Long, Long)] =
    df.select(col("id"), explode(shinglesOld(col("text"), n)).as("g"))
      .select(col("id"), KmvDistinct.kmvHash60(col("g")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def newHashes(df: DataFrame, n: Int): Seq[(Long, Long)] =
    df.select(col("id"), explode(
        KmvDistinct.kmvShingleHash60(tokensOld(col("text")), n)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def assertIdentical(df: DataFrame, n: Int): Unit = {
    val o = oldHashes(df, n)
    val nw = newHashes(df, n)
    assert(o === nw, s"gram hash multiset diverged at n=$n")
  }

  test("kernel ≡ frozen chain on realistic text, n=8 (the gate's shape)") {
    val rnd = new scala.util.Random(42)
    val words = Vector("the", "Quick", "brown", "FOX", "jumps", "over",
      "lazy", "dog", "alpha", "beta", "Gamma", "delta42", "x", "…", "ünïcödé")
    val rows = (0L until 200L).map { i =>
      val len = 1 + rnd.nextInt(40)
      (i, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    assertIdentical(rows.toDF("id", "text"), 8)
  }

  test("kernel ≡ frozen chain on edge shapes (empty, <n, ==n, separators)") {
    val rows = Seq(
      (0L, ""),                        // one empty gram
      (1L, "solo"),                    // 1 token < n
      (2L, "a b c"),                   // exactly n tokens at n=3
      (3L, "a  b   c d"),              // repeated spaces → empty tokens
      (4L, " leading and trailing "),  // boundary empties
      (5L, "ÅNGSTRÖM Straße İstanbul mixed CASE tokens here now"),
      (6L, (1 to 100).map(_.toString).mkString(" ")))
    for (n <- Seq(1, 2, 3, 8)) assertIdentical(rows.toDF("id", "text"), n)
  }

  test("null text yields no rows on both paths") {
    val df = Seq((0L, Option("a b c d")), (1L, Option.empty[String]))
      .toDF("id", "text")
    assert(oldHashes(df, 2).map(_._1).distinct === Seq(0L))
    assert(newHashes(df, 2).map(_._1).distinct === Seq(0L))
    assertIdentical(df, 2)
  }

  test("corpusSketchKmv end-to-end sketch is unchanged by the kernel") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(30))("w" + rnd.nextInt(50)).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val viaOp = graft.ops.Dedup.corpusSketchKmv(df, "text", n = 8, k = 64)
    val viaFrozen = df
      .select(explode(shinglesOld(col("text"), 8)).as("g"))
      .select(KmvDistinct.kmvHash60(col("g")).as("h"))
      .agg(KmvDistinct.kmv_set(col("h"), 64))
      .head().getSeq[Long](0).toArray
    assert(viaOp.toSeq === viaFrozen.toSeq)
  }
}
