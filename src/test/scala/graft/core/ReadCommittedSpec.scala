package graft.core

import graft.SparkSuite

/** Pins the readCommitted retry loop's failure-surface contract (in
  * package graft.core for access to the private[core] method): the
  * happy path and the race itself are exercised end-to-end by
  * CollectionSpec's concurrent-commit stress; these pins cover the two
  * edges that stress can't hit deterministically. */
class ReadCommittedSpec extends SparkSuite {

  private def persistentCollection(): Collection = {
    val root = java.nio.file.Files.createTempDirectory("graft-rcspec").toString
    val ef = new graft.embed.HashingEmbeddingFunc(8)
    val db = DB.persistent(spark, root, ef)
    val c = db.createCollection("rc", Map.empty, ef)
    c.addDocuments(Seq(Document.create("d1", content = "one")))
    c
  }

  test("sustained file loss exhausts the retry and surfaces a descriptive exception, not a raw FNFE") {
    val c = persistentCollection()
    var calls = 0
    val e = intercept[java.util.ConcurrentModificationException] {
      c.readCommitted[Int] {
        calls += 1
        throw new java.io.FileNotFoundException(s"gone (attempt $calls)")
      }
    }
    assert(calls === 3, "exactly maxAttempts body runs, no silent 4th attempt")
    assert(e.getMessage.contains("3 times"),
      s"message should name the attempt count: ${e.getMessage}")
    assert(e.getCause.isInstanceOf[java.io.FileNotFoundException],
      "last loss attached as cause")
    assert(e.getCause.getMessage.contains("attempt 3"))
  }

  test("a cause CYCLE of length 2 in a non-file-loss error terminates the walk and propagates raw") {
    val c = persistentCollection()
    // A -> B -> A: the pre-fix walk (self-reference check only) spun
    // forever inside the catch guard; the depth bound must terminate it
    // and classify the chain as not-file-loss, so the error propagates
    // unretried and unwrapped.
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b)
    var calls = 0
    val out = intercept[RuntimeException] {
      c.readCommitted[Int] { calls += 1; throw a }
    }
    assert(out eq a, "non-file-loss errors propagate raw")
    assert(calls === 1, "non-file-loss errors are not retried")
  }

  test("a FileNotFoundException buried in a cause cycle is still classified as file loss") {
    val c = persistentCollection()
    val fnfe = new java.io.FileNotFoundException("part-0000 deleted by commit")
    val outer = new RuntimeException("task failed", fnfe)
    fnfe.initCause(outer) // cycle fnfe -> outer -> fnfe
    var calls = 0
    intercept[java.util.ConcurrentModificationException] {
      c.readCommitted[Int] { calls += 1; throw outer }
    }
    assert(calls === 3, "file loss inside a cycle still takes the retry path")
  }
}
