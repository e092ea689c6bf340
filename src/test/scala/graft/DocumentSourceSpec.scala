package graft

import java.nio.file.{Files, Paths}

import graft.core.{DB, Document}
import graft.embed.HashingEmbeddingFunc
import graft.sources.DocumentSource

class DocumentSourceSpec extends SparkSuite {

  test("jsonl corpus conforms and ingests end-to-end (dbpedia example shape)") {
    val dir = Files.createTempDirectory("graft-src")
    Files.writeString(dir.resolve("corpus.jsonl"),
      """{"text": "Alan Turing was a mathematician", "category": "person"}
        |{"text": "The Eiffel Tower is in Paris", "category": "place"}
        |{"text": "Spark is a cluster compute engine", "category": "thing"}
        |""".stripMargin)
    val docs = DocumentSource.fromJsonl(spark, dir.resolve("corpus.jsonl").toString,
      contentField = "text", metadataFields = Seq("category"))
    assert(docs.columns.toSeq === Seq("id", "metadata", "embedding", "content"))
    val db = withLogLevel(DB.inMemory(spark, new HashingEmbeddingFunc(32)))
    val c = db.createCollection("corpus")
    c.addDF(docs)
    assert(c.count() === 3)
    val r = c.query("eiffel tower paris", 1)
    assert(r.head.metadata("category") === "place")
  }

  test("conform derives stable content-hash ids when no id field exists") {
    import spark.implicits._
    val df = Seq(("same text", "a"), ("same text", "b")).toDF("text", "tag")
    val docs = DocumentSource.conform(df, "text")
    val ids = docs.select("id").as[String].collect()
    assert(ids(0) === ids(1), "identical content must map to the same id")
  }

  test("csv + explicit id field") {
    val dir = Files.createTempDirectory("graft-src")
    Files.writeString(dir.resolve("c.csv"),
      "doc_id,body,lang\n1,hello world,en\n2,hallo welt,de\n")
    val docs = DocumentSource.fromCsv(spark, dir.resolve("c.csv").toString,
      contentField = "body", idField = "doc_id", metadataFields = Seq("lang"))
    val rows = docs.collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("1", "2"))
    assert(rows.head.getMap[String, String](1).size === 1)
  }

  test("text lines: one doc per line, empty lines dropped") {
    val dir = Files.createTempDirectory("graft-src")
    Files.writeString(dir.resolve("t.txt"), "line one\n\nline two\n")
    assert(DocumentSource.fromTextLines(spark, dir.resolve("t.txt").toString)
      .count() === 2)
  }

  test("missing content field is a clear error") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      DocumentSource.conform(Seq(("x")).toDF("a"), "nope")
    }
    assert(e.getMessage.contains("content field 'nope' not found"))
  }

  test("writeJsonl round-trips through fromJsonl") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl-rt")
      .resolve("out").toString
    val docs = withLogLevel(Seq(
      ("d1", Map("lang" -> "en"), Array(0.5f, 0.25f), "hello world"),
      ("d2", Map.empty[String, String],
        null.asInstanceOf[Array[Float]], "zweite zeile"))
      .toDF("id", "metadata", "embedding", "content"))
    DocumentSource.writeJsonl(docs, dir)
    val back = DocumentSource.fromJsonl(spark, dir, "content", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getString(3), Option(r.getSeq[Float](2)).map(_.toSeq)))).toMap
    assert(back("d1") === (("hello world", Some(Seq(0.5f, 0.25f)))))
    assert(back("d2") === (("zweite zeile", None)))
  }

  test("writeJsonl round-trips per-row metadata maps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl-md")
      .resolve("out").toString
    // varying key sets per row: the inferred struct carries the key
    // UNION, and conform must drop the keys a row doesn't have rather
    // than inventing empty-string entries
    val docs = withLogLevel(Seq(
      ("d1", Map("lang" -> "en", "src" -> "web"), "first"),
      ("d2", Map("lang" -> "de"), "second"),
      ("d3", Map.empty[String, String], "third"))
      .toDF("id", "metadata", "content")
      .withColumn("embedding",
        org.apache.spark.sql.functions.lit(null).cast("array<float>")))
    DocumentSource.writeJsonl(docs, dir)
    val back = DocumentSource.fromJsonl(spark, dir, "content", "id")
      .collect().map(r => r.getString(0) -> r.getMap[String, String](1).toMap)
      .toMap
    assert(back("d1") === Map("lang" -> "en", "src" -> "web"))
    assert(back("d2") === Map("lang" -> "de"))
    assert(back("d3") === Map.empty[String, String])
  }
}
