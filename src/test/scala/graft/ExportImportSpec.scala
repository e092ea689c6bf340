package graft

import java.nio.file.Files

import graft.core.{DB, Document}
import graft.embed.ConstEmbeddingFunc
import graft.persist.ExportImport

/** Export/import round-trips across the 4 format combos — mirrors
  * reference db_test.go:70-280. */
class ExportImportSpec extends SparkSuite {

  private val key32 = "0123456789abcdef0123456789abcdef"

  private def populated: DB = withLogLevel {
    val db = DB.inMemory(spark, ConstEmbeddingFunc.stub())
    val c1 = db.createCollection("alpha", Map("kind" -> "a"))
    c1.addDocuments(Seq(
      Document("1", Map("k" -> "v"), content = "hello world"),
      Document("2", Map.empty, content = "hallo welt")))
    val c2 = db.createCollection("beta", Map("kind" -> "b"))
    c2.addDocuments(Seq(Document("x", content = "beta content")))
    db
  }

  private def assertRestored(db: DB): Unit = {
    val a = db.getCollection("alpha")
    assert(a != null && a.count() === 2)
    assert(a.metadata === Map("kind" -> "a"))
    val d = a.getByID("1")
    assert(d.content === "hello world" && d.metadata === Map("k" -> "v"))
    assert(d.embedding.toSeq === ConstEmbeddingFunc.stub3.toSeq)
    assert(db.getCollection("beta").count() === 1)
  }

  for ((compress, enc) <- Seq((false, ""), (true, ""), (false, key32), (true, key32))) {
    val label = (if (compress) "gzip" else "plain") + (if (enc.nonEmpty) "+aes" else "")
    test(s"export/import round-trip: $label") {
      val f = Files.createTempDirectory("graft-exp").resolve("db.snapshot").toString
      populated.exportToFile(f, compress, enc)
      val fresh = DB.inMemory(spark, ConstEmbeddingFunc.stub())
      fresh.importFromFile(f, enc)
      assertRestored(fresh)
    }
  }

  test("gzip actually compresses and is auto-detected on import") {
    val dir = Files.createTempDirectory("graft-exp")
    val plain = dir.resolve("plain.snap")
    val gz = dir.resolve("gz.snap")
    val db = populated
    db.exportToFile(plain.toString, compress = false)
    db.exportToFile(gz.toString, compress = true)
    assert(Files.readAllBytes(gz).take(2).map(_ & 0xFF).toSeq === Seq(0x1f, 0x8b))
  }

  test("selective import only restores requested collections (db.go:251-253)") {
    val f = Files.createTempDirectory("graft-exp").resolve("db.snap").toString
    populated.exportToFile(f)
    val fresh = DB.inMemory(spark, ConstEmbeddingFunc.stub())
    fresh.importFromFile(f, "", Seq("beta"))
    assert(fresh.getCollection("alpha") == null)
    assert(fresh.getCollection("beta").count() === 1)
  }

  test("selective export validates collection existence") {
    val f = Files.createTempDirectory("graft-exp").resolve("db.snap").toString
    val e = intercept[IllegalArgumentException] {
      populated.exportToFile(f, false, "", Seq("nope"))
    }
    assert(e.getMessage === "collection doesn't exist: nope")
  }

  test("import overwrites existing same-named collections (db.go:201)") {
    val f = Files.createTempDirectory("graft-exp").resolve("db.snap").toString
    populated.exportToFile(f)
    val target = DB.inMemory(spark, ConstEmbeddingFunc.stub())
    target.createCollection("alpha", Map("kind" -> "old"))
      .addDocuments(Seq(Document("z", content = "stale")))
    target.importFromFile(f)
    assertRestored(target)
    assert(!target.getCollection("alpha").listIDs().contains("z"))
  }

  test("wrong key / short key errors") {
    val f = Files.createTempDirectory("graft-exp").resolve("db.snap").toString
    val e = intercept[IllegalArgumentException] {
      populated.exportToFile(f, false, "short")
    }
    assert(e.getMessage === "encryption key must be 32 bytes long")
    populated.exportToFile(f, false, key32)
    intercept[Exception] {
      DB.inMemory(spark, ConstEmbeddingFunc.stub())
        .importFromFile(f, "ffffffffffffffffffffffffffffffff")
    }
  }

  test("tampered ciphertext tail is rejected (GCM tag verified via drain)") {
    // the streamed import unwraps zip entries BEFORE the stream ends; the
    // GCM tag only authenticates at EOF, so the import drains the chain —
    // flipping a bit in the trailing tag bytes must fail the import, not
    // silently succeed with unauthenticated data
    val f = Files.createTempDirectory("graft-exp").resolve("db.snap")
    populated.exportToFile(f.toString, compress = false, key32)
    val bytes = Files.readAllBytes(f)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    val g = f.resolveSibling("tampered.snap")
    Files.write(g, bytes)
    intercept[Exception] {
      DB.inMemory(spark, ConstEmbeddingFunc.stub())
        .importFromFile(g.toString, key32)
    }
  }

  test("a corrupt archive entry fails the import BEFORE destroying ANY existing collection") {
    // createCollection-overwrite is destructive; the import validates
    // every staged entry (full decode + id contract) before the FIRST
    // overwrite, so a corrupt entry surfaces while all old same-named
    // collections are still intact (r12 fix — previously the overwrite
    // happened before the first read touched the data pages, and
    // per-entry validation would still have left a mixed old/new DB
    // when the corrupt entry is not the first). Corrupting BETA (sorted
    // after alpha in the manifest) pins exactly that: valid alpha must
    // NOT have been imported when beta's validation fails.
    val dir = Files.createTempDirectory("graft-exp")
    val f = dir.resolve("db.snap")
    populated.exportToFile(f.toString)
    // rewrite the zip, garbling beta's documents.parquet bytes
    val betaEntry = graft.persist.Persistence.hash2hex("beta") + "/documents.parquet"
    val g = dir.resolve("corrupt.snap")
    val zis = new java.util.zip.ZipInputStream(
      new java.io.BufferedInputStream(Files.newInputStream(f)))
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(g)))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        val bytes = zis.readAllBytes()
        if (e.getName == betaEntry) {
          val rnd = new java.util.Random(1L)
          rnd.nextBytes(bytes) // same length, pure garbage
        }
        zos.write(bytes)
        zos.closeEntry()
        e = zis.getNextEntry
      }
    } finally { zis.close(); zos.close() }
    val target = DB.inMemory(spark, ConstEmbeddingFunc.stub())
    target.createCollection("alpha", Map("kind" -> "precious"))
      .addDocuments(Seq(Document("keep", content = "still here")))
    target.createCollection("beta", Map("kind" -> "fragile"))
      .addDocuments(Seq(Document("keep2", content = "also here")))
    intercept[Exception] { withLogLevel(target.importFromFile(g.toString)) }
    val alpha = target.getCollection("alpha")
    assert(alpha != null && alpha.getByID("keep").content === "still here",
      "valid-but-not-yet-imported collection must survive a corrupt import")
    assert(alpha.metadata === Map("kind" -> "precious"))
    val beta = target.getCollection("beta")
    assert(beta != null && beta.getByID("keep2").content === "also here")
    assert(beta.metadata === Map("kind" -> "fragile"))
  }

  test("import into a persistent DB re-persists (db.go:261-275)") {
    val f = Files.createTempDirectory("graft-exp").resolve("db.snap").toString
    populated.exportToFile(f)
    val root = Files.createTempDirectory("graft-exp-p").toString
    DB.persistent(spark, root, ConstEmbeddingFunc.stub()).importFromFile(f)
    // reopen from disk only
    val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    assertRestored(reopened)
  }
}
