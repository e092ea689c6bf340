package graft

import org.apache.spark.sql.functions._

import graft.ops.{KeywordSearch, TermIndex}

class TermIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = withLogLevel(Seq(
    (1L, "spark spark spark runs fast"),
    (2L, "spark is a query engine"),
    (3L, "vector search inside a query engine"),
    (4L, "nothing relevant here at all"),
    (5L, "spark")
  ).toDF("doc_id", "text"))

  private lazy val idx = withLogLevel {
    val dir = java.nio.file.Files.createTempDirectory("tix").toString
    TermIndex.build(docs, "text", "doc_id", dir)
  }

  test("bucketOf matches the bucket column written at build time") {
    val terms = Seq("spark", "query", "vector", "engine", "π")
    val fromCol = spark.createDataset(terms).toDF("t")
      .select(col("t"), graft.ops.TermIndex.bucketCol(col("t")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach(t => assert(TermIndex.bucketOf(t) === fromCol(t), t))
  }

  test("build refuses an empty corpus instead of persisting NaN avg_dl") {
    val dir = java.nio.file.Files.createTempDirectory("tix_empty").toString
    val e = intercept[IllegalArgumentException] {
      TermIndex.build(docs.filter(col("doc_id") < 0), "text", "doc_id", dir)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("indexed BM25 returns bit-identical scores to the scan path") {
    val terms = Seq("spark", "query")
    val scan = KeywordSearch.bm25TopK(docs, "text", "doc_id", terms, k = 10,
      k1 = 1.5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = idx.topK(terms, k = 10, k1 = 1.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed === scan) // same docs, same order, same exact doubles
  }

  test("posting rows carry denormalized dl and df") {
    val p = idx.postings.filter(col("token") === "spark")
      .select("doc", "tf", "dl", "df").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(p === Set((1L, 3L, 5L, 3L), (2L, 1L, 5L, 3L), (5L, 1L, 1L, 3L)))
  }

  test("probe scan is partition-pruned on the term bucket") {
    val plan = idx.topK(Seq("spark"), k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tbkt"),
      s"expected bucket partition pruning:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("corpus stats survive the save/load round trip") {
    assert(idx.nDocs === 5L)
    assert(idx.avgDl === 22.0 / 5)
  }
}
