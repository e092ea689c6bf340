package graft

import java.nio.file.{Files, Paths}

import graft.core.{DB, Document}
import graft.embed.ConstEmbeddingFunc
import graft.persist.{Json, ParquetPersistence, Persistence}

class PersistenceSpec extends SparkSuite {

  private def tempRoot: String =
    Files.createTempDirectory("graft-persist-spec").toString

  test("hash2hex matches the reference dir-naming scheme (persistence.go:22-28)") {
    // sha256("test")[0:4] hex
    assert(Persistence.hash2hex("test") === "9f86d081")
  }

  test("persistent DB round-trip: create, add, reopen (db.go:68-181)") {
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    val c = db.createCollection("docs", Map("owner" -> "spec"))
    c.addDocuments(Seq(
      Document("1", Map("k" -> "v"), content = "hello world"),
      Document("2", Map.empty, content = "hallo welt")))

    val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    val rc = reopened.getCollection("docs")
    assert(rc != null)
    assert(rc.count() === 2)
    assert(rc.metadata === Map("owner" -> "spec"))
    val d = rc.getByID("1")
    assert(d.content === "hello world" && d.metadata === Map("k" -> "v"))
    assert(d.embedding.toSeq === ConstEmbeddingFunc.stub3.toSeq)
  }

  test("persistent open schedules zero Spark jobs; the count defers to first use") {
    // a catalog-scale deployment opens thousands of collections —
    // DB.persistent used to run one count job per entry before
    // returning; the Snap count is lazy now and the open must be
    // job-free (parquet reads with an explicit schema plan without jobs)
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    (1 to 3).foreach { i =>
      db.createCollection(s"cat$i").addDocuments(
        Seq(Document(s"d$i", content = s"doc $i"), Document(s"e$i", content = "x")))
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
      assert(reopened.listCollections().size === 3)
      // listener delivery is async: give the bus a moment, then demand
      // silence (a false quiet here would need >1s of bus lag on an
      // idle local scheduler)
      Thread.sleep(1000)
      assert(jobs.get() === 0,
        s"persistent open must schedule no Spark jobs, saw ${jobs.get()}")
      // first count() forces the deferred job and serves the real number
      assert(reopened.getCollection("cat2").count() === 2)
      // O(1) afterwards: the lazy val is initialized, no second job —
      // poll the listener for the forced job, then re-read
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() >= 1, "first count() must run the deferred job")
      val after = jobs.get()
      assert(reopened.getCollection("cat2").count() === 2)
      Thread.sleep(300)
      assert(jobs.get() === after, "second count() must be served from state")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("createCollection overwrite clears the old documents on disk") {
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    val c = db.createCollection("ow")
    c.addDocuments(Seq(Document("1", content = "old row")))
    // overwrite: in-memory count is 0 — disk must agree after a reload,
    // not resurrect the previous collection's parquet
    val c2 = db.createCollection("ow", Map("gen" -> "2"))
    assert(c2.count() === 0)
    val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    val rc = reopened.getCollection("ow")
    assert(rc.count() === 0, "overwritten collection must reload empty")
    assert(rc.metadata === Map("gen" -> "2"))
  }

  test("exact query paths skip embedding-less rows from externally landed parquet") {
    val root = tempRoot
    val db0 = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    val c0 = db0.createCollection("ext")
    c0.addDocuments(Seq(Document("a", content = "first"),
      Document("b", content = "second")))
    // land an embedding-less row the way an external writer would:
    // append document-schema parquet with embedding = null
    val dir = graft.persist.Persistence.collectionDir(root, "ext")
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("c", Map.empty[String, String], null, "no vector")),
      Document.schema)
    extra.write.mode("append").parquet(dir.resolve("documents").toString)
    val db = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    val c = db.getCollection("ext")
    assert(c.count() === 3, "null-embedding rows still count as documents")
    // nResults = full count reaches past the embedded rows — the null
    // similarity must be filtered, not crash .as[QueryResult]
    val r = c.queryEmbedding(ConstEmbeddingFunc.stub3, 3)
    assert(r.map(_.id).toSet === Set("a", "b"))
    assert(c.queryDF(ConstEmbeddingFunc.stub3, 3).count() === 2)
  }

  test("compress knob writes gzip parquet and round-trips (db.go:57-66)") {
    val root = tempRoot
    val db = withLogLevel(
      DB.persistent(spark, root, ConstEmbeddingFunc.stub(), compress = true))
    val c = db.createCollection("gz")
    c.addDocuments(Seq(
      Document("1", content = "compress me"), Document("2", content = "me too")))
    val files = Files.walk(Paths.get(root)).iterator()
    var sawGz = false
    while (files.hasNext) {
      val f = files.next().getFileName.toString
      if (f.endsWith(".gz.parquet")) sawGz = true
      assert(!f.endsWith(".snappy.parquet"), s"session codec leaked into $f")
    }
    assert(sawGz, "expected gzip-compressed parquet parts")
    // codec-agnostic reopen (with the default, non-compressing constructor)
    val rc = DB.persistent(spark, root, ConstEmbeddingFunc.stub()).getCollection("gz")
    assert(rc.count() === 2 && rc.getByID("2").content === "me too")
  }

  test("mutations persist through reopen (delete survives)") {
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    val c = db.createCollection("mut")
    c.addDocuments(Seq(
      Document("1", content = "a"), Document("2", content = "b"),
      Document("3", content = "c")))
    c.delete(ids = Seq("2"))
    val rc = DB.persistent(spark, root, ConstEmbeddingFunc.stub()).getCollection("mut")
    assert(rc.listIDs().toSet === Set("1", "3"))
  }

  test("deleteCollection removes directory; reset wipes root (db.go:586-629)") {
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    db.createCollection("gone").addDocuments(Seq(Document("1", content = "x")))
    val dir = Persistence.collectionDir(root, "gone")
    assert(Files.exists(dir))
    db.deleteCollection("gone")
    assert(!Files.exists(dir))
    assert(db.getCollection("gone") == null)
    db.createCollection("a").addDocuments(Seq(Document("1", content = "x")))
    db.reset()
    assert(db.listCollections().isEmpty)
    assert(Files.list(Paths.get(root)).count() === 0)
  }

  test("foreign files in the root are skipped on load (db.go:117-133)") {
    val root = tempRoot
    Files.writeString(Paths.get(root, "stray.txt"), "not a collection")
    Files.createDirectory(Paths.get(root, "strangedir"))
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    assert(db.listCollections().isEmpty)
  }

  test("catalog ops: getOrCreate, list, copies (db.go:498-580)") {
    val db = withLogLevel(DB.inMemory(spark, ConstEmbeddingFunc.stub()))
    val a = db.getOrCreateCollection("x", Map("m" -> "1"))
    val b = db.getOrCreateCollection("x", Map("m" -> "2"))
    assert(a eq b, "getOrCreate must return the existing collection")
    assert(b.metadata === Map("m" -> "1"))
    assert(db.listCollections().keySet === Set("x"))
  }

  test("getOrCreate re-attaches the caller's embedding func to an existing collection (db.go:552-558)") {
    val root = tempRoot
    val db0 = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    db0.createCollection("c1").add(Seq("d1"),
      embeddings = Seq(ConstEmbeddingFunc.stub3))
    // reload: collections come back carrying the DEFAULT embedder
    val db = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    val mine = new graft.embed.HashingEmbeddingFunc(3)
    val c = db.getOrCreateCollection("c1", embeddingFunc = mine)
    assert(c.embedFunc eq mine,
      "existing collection must get the caller's embedding func re-attached")
  }

  test("Json round-trips nested structures") {
    val s = """{"name": "a\nb", "xs": [1, 2.5, true, null, "t"], "o": {"k": "v"}}"""
    val p = Json.parse(s).asInstanceOf[Map[String, Any]]
    assert(p("name") === "a\nb")
    assert(p("xs").asInstanceOf[List[Any]] === List(1.0, 2.5, true, null, "t"))
    assert(p("o").asInstanceOf[Map[String, Any]]("k") === "v")
  }

  test("Json encode∘parse is the identity on 300 random nested structures") {
    // the sidecar/provider codec was made strict in r12; pin the happy
    // path generatively — random nesting with hostile strings (quotes,
    // backslashes, control chars, non-ASCII) and both number shapes
    val rnd = new scala.util.Random(1414)
    val charPool = "az09 _-\"\\\n\t\ré—α".toCharArray
    def randString(): String =
      Seq.fill(rnd.nextInt(12))(charPool(rnd.nextInt(charPool.length))).mkString
    def leaf(): Any = rnd.nextInt(5) match {
      case 0 => randString()
      case 1 => rnd.nextInt(2000) - 1000 // integer-valued
      case 2 => (rnd.nextDouble() - 0.5) * 1e6
      case 3 => rnd.nextBoolean()
      case _ => null
    }
    def gen(depth: Int): Any =
      if (depth == 0) leaf()
      else rnd.nextInt(6) match {
        case 0 => (1 to rnd.nextInt(4))
          .map(i => s"k$i${randString()}" -> gen(depth - 1)).toMap
        case 1 => List.fill(rnd.nextInt(4))(gen(depth - 1))
        case _ => leaf()
      }
    def enc(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case i: Int => Json.num(i.toDouble)
      case d: Double => Json.num(d)
      case s: String => Json.str(s)
      case m: Map[_, _] => Json.obj(m.toSeq.map {
        case (k, x) => k.asInstanceOf[String] -> enc(x) }: _*)
      case l: List[_] => Json.arr(l.map(enc))
    }
    // parse returns Double for every number — normalize the expectation
    def norm(v: Any): Any = v match {
      case i: Int => i.toDouble
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => k -> norm(x) }
      case l: List[_] => l.map(norm)
      case x => x
    }
    (1 to 300).foreach { trial =>
      val v = gen(3)
      val parsed = Json.parse(enc(v))
      assert(parsed === norm(v), s"trial $trial: ${enc(v)}")
    }
  }

  test("a hash2hex dir collision refuses to create, never wipes the live owner (r12)") {
    // coll-38974 and coll-50694 genuinely share SHA-256 prefix 3e32ca04
    // (found by search) — the reference's 4-byte dir scheme collides at
    // birthday scale, and createCollection previously deleteTree'd the
    // LIVE other collection's directory before writing its own sidecar
    val root = java.nio.file.Files.createTempDirectory("graft-coll").toString
    val ef = new graft.embed.HashingEmbeddingFunc(8)
    val db = graft.core.DB.persistent(spark, root, ef)
    val a = db.createCollection("coll-38974", Map.empty, ef)
    a.addDocuments(Seq(graft.core.Document.create("d1", content = "precious data")))
    val e = intercept[IllegalStateException] {
      db.createCollection("coll-50694", Map.empty, ef)
    }
    assert(e.getMessage.contains("coll-38974"), e.getMessage)
    assert(a.getByID("d1").content === "precious data", "owner intact")
    // and the owner survives a fresh reopen
    val re = graft.core.DB.persistent(spark, root, ef)
    assert(re.getCollection("coll-38974").getByID("d1").content === "precious data")
  }

  test("deleteCollection of a colliding absent name never wipes the live owner (r13)") {
    // same colliding pair, delete path: deleteCollection is a no-op for
    // an absent name, but it resolves the directory by the same 4-byte
    // hash — before the r13 guard it deleteTree'd the LIVE owner's data
    val root = java.nio.file.Files.createTempDirectory("graft-colldel").toString
    val ef = new graft.embed.HashingEmbeddingFunc(8)
    val db = graft.core.DB.persistent(spark, root, ef)
    val a = db.createCollection("coll-38974", Map.empty, ef)
    a.addDocuments(Seq(graft.core.Document.create("d1", content = "precious data")))
    db.deleteCollection("coll-50694") // absent; hash-collides with the owner
    assert(a.getByID("d1").content === "precious data", "owner intact in memory")
    val re = graft.core.DB.persistent(spark, root, ef)
    assert(re.getCollection("coll-38974").getByID("d1").content === "precious data",
      "owner's directory survived the colliding delete")
    // deleting the OWNER by its own name still clears the directory
    re.deleteCollection("coll-38974")
    val re2 = graft.core.DB.persistent(spark, root, ef)
    assert(re2.getCollection("coll-38974") == null, "owner really deleted by its own name")
  }

  test("Json rejects malformed input loudly (no raw index errors, no lenient literals)") {
    // truncated strings/escapes surfaced StringIndexOutOfBounds and any
    // 4 chars starting with t/f/n parsed as a literal before the r12
    // hardening — provider HTTP bodies and sidecars reach this parser
    for (bad <- Seq(
        """{"k": "unterminated""",      // string never closes
        """{"k": "trailing\""",         // escape at end of input
        "{\"k\": \"\\u00",              // truncated unicode escape
        """{"k": tru}""",               // partial literal
        """{"k": falsx}""",             // wrong literal tail
        """{"k": nul}"""))              // partial null
      withClue(bad) {
        intercept[IllegalArgumentException](Json.parse(bad))
      }
    // trailing garbage after the top-level value fails too — a torn or
    // concatenated sidecar must error, not half-parse (r12)
    intercept[IllegalArgumentException](Json.parse("""{"v": 1}{"v": 9}"""))
    intercept[IllegalArgumentException](Json.parse("""{"v": 1} junk"""))
    // exact literals still parse (trailing whitespace is fine)
    assert(Json.parse("""[true, false, null]  """).asInstanceOf[List[Any]]
      === List(true, false, null))
  }

  test("crashed swap window (only documents.old on disk) recovers the last dataset") {
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    val c = db.createCollection("cr")
    c.addDocuments(Seq(Document("1", content = "a"), Document("2", content = "b")))
    // simulate a kill between write()'s two renames: current gone, .old left
    val dir = Persistence.collectionDir(root, "cr")
    Files.move(dir.resolve("documents"), dir.resolve("documents.old"))
    val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    val rc = reopened.getCollection("cr")
    // read() restored the last complete dataset instead of reporting empty
    assert(rc.count() === 2)
    assert(Files.exists(dir.resolve("documents")))
    assert(!Files.exists(dir.resolve("documents.old")))
  }

  test("write() after a torn swap restores .old instead of deleting the only dataset") {
    val root = tempRoot
    val dir = Persistence.collectionDir(root, "wr")
    Files.createDirectories(dir)
    val p = new ParquetPersistence(dir)
    import spark.implicits._
    p.write(Seq(("1", "a"), ("2", "b"), ("3", "c")).toDF("id", "content")
      .select(Document.schema.fieldNames.toIndexedSeq.map(f =>
        if (f == "id" || f == "content") org.apache.spark.sql.functions.col(f)
        else org.apache.spark.sql.functions.lit(null).cast(Document.schema(f).dataType).as(f)): _*))
    // a lazy plan over the CURRENT parquet (the delete-as-anti-filter shape)
    val planned = p.read(spark).filter(org.apache.spark.sql.functions.col("id") =!= "2")
    // simulate a prior write that failed between its two renames: current
    // gone, .old holds the only complete dataset — and no read() ran since
    Files.move(dir.resolve("documents"), dir.resolve("documents.old"))
    // write() must restore .old first; deleting it here would both lose the
    // dataset and fail this very scan
    p.write(planned)
    val back = p.read(spark)
    assert(back.count() === 2)
    assert(back.select("id").collect().map(_.getString(0)).sorted === Array("1", "3"))
    assert(!Files.exists(dir.resolve("documents.old")))
    assert(!Files.exists(dir.resolve("documents.tmp")))
  }

  test("deleteCollection fences a stale handle off disk (no resurrection)") {
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    val stale = db.createCollection("fence")
    stale.addDocuments(Seq(Document("1", content = "a")))
    db.deleteCollection("fence")
    // the detached handle must NOT recreate the deleted directory (a
    // sidecar-less dir would half-resurrect on the next DB.persistent
    // reload). Its own next mutation fails LOUDLY — the upsert plan
    // anti-joins against the deleted parquet — which is the correct
    // outcome: an error, not silent resurrection.
    intercept[Exception] {
      stale.addDocuments(Seq(Document("2", content = "b")))
    }
    assert(!Files.exists(Persistence.collectionDir(root, "fence")))
    val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    assert(reopened.getCollection("fence") === null)
  }

  test("count() on a stale open-loaded handle to a deleted collection fails loudly (r13)") {
    // the lazy open-time count made this deliberate: a reopened handle
    // that never forced its count reads live parquet on the first
    // count() — after deleteCollection that view is gone, and the
    // read-committed retry exhausts loudly (the stale-handle philosophy
    // above: an error, not a silently stale number). A handle whose
    // count was already forced keeps serving the memoized driver-state
    // number, the documented O(1) contract.
    val root = tempRoot
    val db = withLogLevel(DB.persistent(spark, root, ConstEmbeddingFunc.stub()))
    db.createCollection("lazyfence")
      .addDocuments(Seq(Document("1", content = "a")))
    val reopened = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
    val stale = reopened.getCollection("lazyfence") // count never forced
    val forced = DB.persistent(spark, root, ConstEmbeddingFunc.stub())
      .getCollection("lazyfence")
    assert(forced.count() === 1) // forced BEFORE the delete: memoized
    db.deleteCollection("lazyfence")
    intercept[Exception] { stale.count() }
    assert(forced.count() === 1, "already-forced count stays O(1) driver state")
  }
}
