package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.BucketedCorpus

class BucketedCorpusSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val docs = (1L to 200L)
    .map(i => (i, s"document body number $i with shared tokens"))
    .toDF("id", "text")

  test("bucketed round-trip preserves rows exactly") {
    val dir = tmpDir("bc-rt")
    BucketedCorpus.save(docs, "bc_rt", dir, buckets = 4, key = "id")
    val back = spark.table("bc_rt")
    assert(back.count() === 200L)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("co-bucketed id join plans ZERO exchanges on either side") {
    val dirA = tmpDir("bc-a")
    val dirB = tmpDir("bc-b")
    BucketedCorpus.save(docs, "bc_corpus", dirA, buckets = 4, key = "id")
    BucketedCorpus.save(
      docs.select(col("id"), length(col("text")).as("n_chars")),
      "bc_stats", dirB, buckets = 4, key = "id")
    // force the join strategy that would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bc_corpus").join(spark.table("bc_stats"), "id")
      val p = withLogLevel(j.queryExecution.executedPlan.toString)
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$p")
      assert(j.count() === 200L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("register re-attaches an existing layout metadata-only") {
    val dir = tmpDir("bc-reg")
    BucketedCorpus.save(docs, "bc_orig", dir, buckets = 4, key = "id")
    spark.sql("DROP TABLE bc_orig") // simulate a fresh session's catalog
    BucketedCorpus.register(spark, "bc_again", dir, buckets = 4, key = "id")
    val back = spark.table("bc_again")
    assert(back.count() === 200L)
    // bucketing metadata is live again: a self-join on id needs no shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = withLogLevel(back.join(back.select("id"), "id")
        .queryExecution.executedPlan.toString)
      assert(!p.contains("Exchange"),
        s"re-registered bucket layout must keep join locality:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
