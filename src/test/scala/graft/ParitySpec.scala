package graft

import graft.core.{DB, Document, NegativeQueryOptions, QueryOptions}
import graft.embed.{ConstEmbeddingFunc, CohereEmbeddingFunc}

/**
 * Error-message parity table: every user-facing exact string the
 * reference asserts or raises (collection_test.go:313-392, db_test.go,
 * collection.go, db.go, document.go, vector.go, persistence.go) is
 * asserted against OUR exceptions here, one row per reference string.
 * IO-wrapper messages ("couldn't read file: %w" etc.) are Go plumbing
 * with no Spark analog and are intentionally out of scope.
 */
class ParitySpec extends SparkSuite {

  private def db = withLogLevel(DB.inMemory(spark, ConstEmbeddingFunc.stub()))

  private def coll() = {
    val c = db.createCollection("t", Map.empty, ConstEmbeddingFunc.stub())
    c.addDocuments(Seq(Document.create("1", content = "hello world",
      embeddingFunc = ConstEmbeddingFunc.stub())))
    c
  }

  private def msg(t: => Any): String =
    intercept[Exception](t).getMessage

  test("query errors (collection_test.go:313-392)") {
    val c = coll()
    assert(msg(c.query("", 1)) === "queryText is empty")
    assert(msg(c.query("foo", -1)) === "nResults must be > 0")
    assert(msg(c.query("foo", 0)) === "nResults must be > 0")
    assert(msg(c.query("foo", 2)) ===
      "nResults must be <= the number of documents in the collection")
    assert(msg(c.query("foo", 1, whereDocument = Map("invalid" -> "foo"))) ===
      "unsupported operator")
    assert(msg(c.queryEmbedding(Array.empty[Float], 1)) === "queryEmbedding is empty")
    assert(msg(c.queryWithOptions(QueryOptions(nResults = 1))) ===
      "QueryText and QueryEmbedding options are empty")
    assert(msg(c.queryWithOptions(QueryOptions(queryText = "x", nResults = 1,
      negative = NegativeQueryOptions(text = "y", mode = "bogus")))) ===
      """unsupported negative mode: "bogus"""")
  }

  test("add validation errors (collection.go:140-186)") {
    val c = coll()
    assert(msg(c.add(Seq.empty)) === "ids are empty")
    assert(msg(c.add(Seq("a"))) === "either embeddings or contents must be filled")
    assert(msg(c.add(Seq("a"), embeddings = Seq(Array(1f), Array(2f)))) ===
      "ids and embeddings must have the same length")
    assert(msg(c.add(Seq("a"), contents = Seq("x"),
      metadatas = Seq(Map("k" -> "v"), Map.empty))) ===
      "when metadatas is not empty it must have the same length as ids")
    assert(msg(c.add(Seq("a"), contents = Seq("x", "y"))) ===
      "ids and contents must have the same length")
    assert(msg(c.addConcurrently(Seq("a"), contents = Seq("x"), concurrency = 0)) ===
      "concurrency must be at least 1")
    assert(msg(c.addDocuments(Seq.empty)) === "documents slice is nil or empty")
  }

  test("document constructor vs add-path messages (document.go:30,33 vs collection.go:252,255)") {
    assert(msg(Document.create("")) === "id is empty")
    assert(msg(Document.create("x")) === "either embedding or content must be filled")
    assert(msg(Document.validate(Document(""))) === "document ID is empty")
    assert(msg(Document.validate(Document("x"))) ===
      "either document embedding or content must be filled")
  }

  test("lookup / delete / catalog errors (collection.go:311-331,338-344; db.go:498-512,586-592)") {
    val c = coll()
    assert(msg(c.getByID("")) === "document ID is empty")
    assert(msg(c.getByID("nope")) === "document with ID 'nope' not found")
    assert(msg(c.delete()) === "must have at least one of where, whereDocument or ids")
    assert(msg(c.delete(whereDocument = Map("bogus" -> "x"))) ===
      "unsupported whereDocument operator")
    val d = db
    assert(msg(d.createCollection("")) === "collection name is empty")
    assert(msg(d.deleteCollection("")) === "collection name is empty")
  }

  test("vector kernel errors (vector.go:16-18)") {
    assert(msg(graft.functions.VectorFunctions.dot(Array(1f), Array(1f, 2f)))
      .contains("vectors must have the same length"))
  }

  test("export/import errors (db.go:191-236, persistence.go:40-59)") {
    val d = db
    assert(msg(d.exportToFile("")) === "file path is empty")
    assert(msg(d.importFromFile("")) === "file path is empty")
    assert(msg(d.importFromFile("/tmp/definitely-missing-graft.zip")) ===
      "file doesn't exist: /tmp/definitely-missing-graft.zip")
    val dir = java.nio.file.Files.createTempDirectory("parity").toString
    assert(msg(d.exportToFile(dir)) === s"path is a directory: $dir")
    assert(msg(d.importFromFile(dir)) === s"path is a directory: $dir")
    assert(msg(d.exportToFile("/tmp/parity-out.zip", encryptionKey = "short")) ===
      "encryption key must be 32 bytes long")
    val short = java.nio.file.Files.createTempFile("parity", ".enc")
    java.nio.file.Files.write(short, Array[Byte](1, 2, 3))
    assert(msg(d.importFromFile(short.toString, encryptionKey = "k" * 32))
      .contains("encrypted data too short"))
  }

  test("DB.persistent path errors (db.go:77-82)") {
    val f = java.nio.file.Files.createTempFile("parity", ".txt")
    assert(msg(DB.persistent(spark, f.toString, ConstEmbeddingFunc.stub())) ===
      s"path is not a directory: $f")
  }

  test("provider errors (embed_cohere.go, embed_openai.go)") {
    assert(msg(new CohereEmbeddingFunc("k").embed("no prefix")) ===
      "text must start with a valid input type plus colon and space")
  }
}
