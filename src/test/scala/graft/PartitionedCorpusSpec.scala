package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.PartitionedCorpus

class PartitionedCorpusSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val docs = (1L to 120L).map { i =>
    val lang = Seq("en", "de", "fr")(i.toInt % 3)
    (i, lang, s"document body $i in language $lang")
  }.toDF("id", "lang", "text")

  test("partitioned round-trip preserves rows; slice filter prunes at file listing") {
    val dir = tmpDir("pc-rt")
    PartitionedCorpus.save(docs, dir, Seq("lang"))
    val back = PartitionedCorpus.load(spark, dir)
    assert(back.count() === 120L)
    assert(back.select("id", "lang", "text").exceptAll(docs).isEmpty)
    val sliced = back.filter(col("lang") === "en")
    assert(sliced.count() === 40L)
    val p = withLogLevel(sliced.queryExecution.executedPlan.toString)
    // the lang predicate must land in PartitionFilters (directory
    // pruning), NOT in the data filters / pushed row-group filters
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("lang")),
      s"slice predicate must prune partitions:\n$p")
  }

  test("metadata-key layout: missing keys land in the empty partition, where-parity") {
    val dir = tmpDir("pc-meta")
    val coll = Seq(
      ("a", Map("lang" -> "en", "tier" -> "hi"), "alpha"),
      ("b", Map("lang" -> "de"), "beta"),
      ("c", Map.empty[String, String], "gamma")
    ).toDF("id", "metadata", "content")
    PartitionedCorpus.saveByMetadata(coll, dir, "metadata", "lang")
    val back = PartitionedCorpus.load(spark, dir)
    // pruning predicate agrees with the query path's missing-key⇒""
    val en = back.filter(PartitionedCorpus.metaFilter("lang", "en"))
    assert(en.select("id").as[String].collect().toSet === Set("a"))
    val missing = back.filter(PartitionedCorpus.metaFilter("lang", ""))
    assert(missing.select("id").as[String].collect().toSet === Set("c"))
    // and it prunes, not scans
    val p = withLogLevel(en.queryExecution.executedPlan.toString)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("__p_lang")), p)
    // full metadata map survives the round-trip untouched
    assert(back.filter(col("id") === "a")
      .select(element_at(col("metadata"), "tier")).as[String].head() === "hi")
  }

  test("numeric-shaped metadata values keep their exact string form on load") {
    // partition-column type inference would coerce "01" -> int 1 and
    // "1.10" -> 1.1, making metaFilter's string equality silently return
    // ZERO rows; load forces __p_* back to string via an explicit schema
    val dir = tmpDir("pc-num")
    val coll = Seq(
      ("a", Map("version" -> "01"), "alpha"),
      ("b", Map("version" -> "1.10"), "beta"),
      ("c", Map("version" -> "2024-01-01"), "gamma"),
      ("d", Map.empty[String, String], "delta")
    ).toDF("id", "metadata", "content")
    PartitionedCorpus.saveByMetadata(coll, dir, "metadata", "version")
    val back = PartitionedCorpus.load(spark, dir)
    assert(back.schema(PartitionedCorpus.metaCol("version")).dataType ===
      org.apache.spark.sql.types.StringType)
    assert(back.filter(PartitionedCorpus.metaFilter("version", "01"))
      .select("id").as[String].collect().toSet === Set("a"))
    assert(back.filter(PartitionedCorpus.metaFilter("version", "1.10"))
      .select("id").as[String].collect().toSet === Set("b"))
    assert(back.filter(PartitionedCorpus.metaFilter("version", "2024-01-01"))
      .select("id").as[String].collect().toSet === Set("c"))
    assert(back.filter(PartitionedCorpus.metaFilter("version", ""))
      .select("id").as[String].collect().toSet === Set("d"))
    // still prunes at listing time with the explicit schema
    val p = withLogLevel(back.filter(PartitionedCorpus.metaFilter("version", "01"))
      .queryExecution.executedPlan.toString)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("__p_version")), p)
    // user-managed partition columns (save) keep inferred types
    val dir2 = tmpDir("pc-user")
    PartitionedCorpus.save(
      Seq((1L, 2024, "x")).toDF("id", "year", "text"), dir2, Seq("year"))
    assert(PartitionedCorpus.load(spark, dir2).schema("year").dataType !==
      org.apache.spark.sql.types.StringType)
  }
}
