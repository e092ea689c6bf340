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
}
