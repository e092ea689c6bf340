package graft

import graft.core.{DB, Document, NegativeMode, NegativeQueryOptions, QueryOptions}
import graft.embed.{ConstEmbeddingFunc, HashingEmbeddingFunc}

/** API parity with reference collection_test.go (add/query/delete/errors). */
class CollectionSpec extends SparkSuite {

  private def freshDb = withLogLevel(DB.inMemory(spark, ConstEmbeddingFunc.stub()))

  test("add + query roundtrip stores doc fields (collection_test.go:13-311)") {
    val c = freshDb.createCollection("add-test", Map("created-by" -> "spec"))
    c.add(
      ids = Seq("1", "2"),
      metadatas = Seq(Map("k" -> "v1"), Map("k" -> "v2")),
      contents = Seq("hello world", "hallo welt"))
    assert(c.count() === 2)
    val d = c.getByID("1")
    assert(d.metadata === Map("k" -> "v1"))
    assert(d.content === "hello world")
    // stub embedding is pre-normalized; stored as-is
    assert(d.embedding.toSeq === ConstEmbeddingFunc.stub3.toSeq)
    assert(c.metadata === Map("created-by" -> "spec"))
  }

  test("add validation errors (collection.go:140-173)") {
    val c = freshDb.createCollection("add-errors")
    def msg(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(c.add(Seq.empty)) === "ids are empty")
    assert(msg(c.add(Seq("1"))) === "either embeddings or contents must be filled")
    assert(msg(c.add(Seq("1"), embeddings = Seq(Array(1f), Array(2f)))) ===
      "ids and embeddings must have the same length")
    assert(msg(c.add(Seq("1"), contents = Seq("a", "b"))) ===
      "ids and contents must have the same length")
    assert(msg(c.add(Seq("1"), contents = Seq("a"),
      metadatas = Seq(Map("a" -> "b"), Map("c" -> "d")))) ===
      "when metadatas is not empty it must have the same length as ids")
    assert(msg(c.addConcurrently(Seq("1"), contents = Seq("a"), concurrency = 0)) ===
      "concurrency must be at least 1")
  }

  test("query error cases with exact messages (collection_test.go:313-392)") {
    val c = freshDb.createCollection("query-errors")
    c.addDocuments(Seq(Document("1", content = "hello world")))
    def msg(f: => Unit): String = intercept[Exception](f).getMessage
    assert(msg(c.query("", 1)) === "queryText is empty")
    assert(msg(c.queryEmbedding(Array.empty[Float], 1)) === "queryEmbedding is empty")
    assert(msg(c.queryEmbedding(Array(1f), 0)) === "nResults must be > 0")
    assert(msg(c.queryEmbedding(Array(1f), 5)) ===
      "nResults must be <= the number of documents in the collection")
    assert(msg(c.queryWithOptions(QueryOptions(nResults = 1))) ===
      "QueryText and QueryEmbedding options are empty")
    assert(msg(c.queryWithOptions(QueryOptions(
      queryEmbedding = Array(1f, 0f, 0f), nResults = 1,
      negative = NegativeQueryOptions(mode = "bogus", embedding = Array(1f, 0f, 0f))))) ===
      """unsupported negative mode: "bogus"""")
  }

  test("upsert by id overwrites (collection.go:280); within-batch last wins") {
    val c = freshDb.createCollection("upsert")
    c.addDocuments(Seq(
      Document("1", Map("v" -> "first"), content = "one"),
      Document("1", Map("v" -> "second"), content = "one updated"),
      Document("2", Map("v" -> "x"), content = "two")))
    assert(c.count() === 2)
    assert(c.getByID("1").metadata("v") === "second")
    c.addDocuments(Seq(Document("1", Map("v" -> "third"), content = "one again")))
    assert(c.count() === 2)
    assert(c.getByID("1").metadata("v") === "third")
  }

  test("getByID errors (collection.go:311-331)") {
    val c = freshDb.createCollection("get-errors")
    c.addDocuments(Seq(Document("1", content = "x")))
    assert(intercept[IllegalArgumentException](c.getByID("")).getMessage ===
      "document ID is empty")
    assert(intercept[NoSuchElementException](c.getByID("404")).getMessage ===
      "document with ID '404' not found")
  }

  test("delete by ids / metadata / $contains (collection_test.go:555-615)") {
    val c = freshDb.createCollection("del")
    c.addDocuments(Seq(
      Document("1", Map("foo" -> "bar"), content = "hello world"),
      Document("2", Map("a" -> "b"), content = "hallo welt"),
      Document("3", Map("foo" -> "bar"), content = "bonjour le monde"),
      Document("4", Map("e" -> "f"), content = "hola mundo")))
    c.delete(ids = Seq("4"))
    assert(c.count() === 3)
    c.delete(where = Map("foo" -> "bar"))
    assert(c.count() === 1)
    c.delete(whereDocument = Map("$contains" -> "hallo welt"))
    assert(c.count() === 0)
    assert(intercept[IllegalArgumentException](c.delete()).getMessage ===
      "must have at least one of where, whereDocument or ids")
    assert(intercept[IllegalArgumentException](
      c.delete(whereDocument = Map("$bad" -> "x"))).getMessage ===
      "unsupported whereDocument operator")
  }

  test("listIDs projects all ids (collection.go:296-306)") {
    val c = freshDb.createCollection("list")
    c.addDocuments((1 to 5).map(i => Document(i.toString, content = s"doc $i")))
    assert(c.listIDs().toSet === (1 to 5).map(_.toString).toSet)
    // the scale-safe variant stays LAZY: building the frame runs no job
    // and collects nothing to the driver
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val idsDF = c.listIDsDF()
    assert(idsDF.columns === Array("id"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "listIDsDF must not trigger a Spark job")
    assert(idsDF.count() === 5L) // materializes only when the user asks
  }

  test("auto-embedding via EmbeddingFunc when no vector given (collection.go:266-271)") {
    val db = withLogLevel(DB.inMemory(spark, new HashingEmbeddingFunc(32)))
    val c = db.createCollection("autoembed")
    c.addDocuments(Seq(
      Document("a", content = "the quick brown fox"),
      Document("b", content = "the quick brown fox"),
      Document("c", content = "completely different words here")))
    // identical content => identical embedding => similarity 1 on top hit
    val r = c.query("the quick brown fox", 2)
    assert(r.map(_.id).toSet === Set("a", "b"))
    assert(r.forall(x => math.abs(x.similarity - 1f) < 1e-5))
  }

  test("non-normalized user vectors are normalized on ingest (collection.go:272-276)") {
    val c = freshDb.createCollection("norm-ingest")
    c.addDocuments(Seq(Document("1", embedding = Array(3f, 4f, 0f))))
    val stored = c.getByID("1").embedding
    assert(math.abs(graft.functions.VectorFunctions.norm(stored) - 1.0) < 1e-6)
    assert(math.abs(stored(0) - 0.6f) < 1e-6 && math.abs(stored(1) - 0.8f) < 1e-6)
  }

  test("getCollection re-attaches a provided embedding func (db.go:552-558)") {
    val db = freshDb
    val c = db.createCollection("reattach")
    c.addDocuments(Seq(Document("1", content = "hello")))
    val newEf = new HashingEmbeddingFunc(16)
    val re = db.getCollection("reattach", newEf)
    assert(re.embedFunc eq newEf)
    assert(re.count() === 1, "state must carry over")
    assert(db.getCollection("reattach").embedFunc eq newEf,
      "registry must hold the re-attached collection")
    // identity parity (db.go:552-558 mutates the SAME object): a handle
    // taken BEFORE the re-attach must see the new func and later
    // mutations through either handle must be one shared state
    assert(re eq c, "re-attach must not fork the collection object")
    assert(c.embedFunc eq newEf)
    c.addDocuments(Seq(Document("2", content = "world")))
    assert(db.getCollection("reattach").count() === 2,
      "mutation through the old handle must be visible via the registry")
  }


  test("Document.create embeds content when no vector given (document.go:28-53)") {
    val ef = new HashingEmbeddingFunc(16)
    val d = Document.create("1", Map("a" -> "b"), content = "some text", embeddingFunc = ef)
    assert(d.embedding.toSeq === ef.embed("some text").toSeq)
    val withVec = Document.create("2", embedding = Array(1f, 0f), embeddingFunc = ef)
    assert(withVec.embedding.toSeq === Seq(1f, 0f))
    intercept[IllegalArgumentException](Document.create(""))
    intercept[IllegalArgumentException](Document.create("3"))
  }

  test("concurrent writers and readers never see torn state (RWMutex parity, collection.go:21)") {
    val ef = new graft.embed.HashingEmbeddingFunc(16)
    val db = graft.core.DB.inMemory(spark, ef)
    val c = db.createCollection("conc", Map.empty, ef)
    c.addDocuments(Seq(graft.core.Document.create("seed", content = "seed doc")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (1 to 16).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          if (i % 2 == 0) {
            c.addDocuments(Seq(graft.core.Document.create(
              s"d$i", content = s"concurrent doc number $i")))
          } else {
            // readers observe SOME consistent snapshot: count matches the
            // snapshot they query against (no torn reads mid-commit)
            val n = c.count()
            val r = c.query("concurrent doc", math.max(1, math.min(3, n.toInt)))
            assert(r.nonEmpty)
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(errors.isEmpty, s"concurrent ops failed: ${errors.peek()}")
    assert(c.count() === 9) // seed + 8 writers
    assert(c.listIDs().toSet === (Set("seed") ++ (1 to 16).filter(_ % 2 == 0).map(i => s"d$i")))
  }

  test("index-path queries stay coherent under concurrent delete/add/rebuild") {
    // Exercises the single-volatile Snap swap: with the former four
    // independent volatiles, a query could read the OLD flat index and
    // join back against the NEW state — a deleted id's row vanished in
    // the join and the result silently underfilled (< nResults). With a
    // coherent snapshot the index path always returns exactly nResults.
    val ef = new graft.embed.HashingEmbeddingFunc(16)
    val db = graft.core.DB.inMemory(spark, ef)
    val c = db.createCollection("snapc", Map.empty, ef)
    c.addDocuments((1 to 20).map(i =>
      graft.core.Document.create(s"d$i", content = s"stress doc number $i")))
    c.buildIndex()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = pool.submit(new Runnable {
      def run(): Unit = try {
        (1 to 4).foreach { round =>
          c.delete(ids = Seq(s"d$round"))                 // index dropped
          c.addDocuments(Seq(graft.core.Document.create(
            s"d$round-v2", content = s"stress doc number $round again")))
          c.buildIndex()                                  // index-path live again
        }
      } catch { case t: Throwable => errors.add(t) } finally stop.set(true)
    })
    val qv = ef.embed("stress doc")
    val readers = (1 to 5).map(_ => pool.submit(new Runnable {
      def run(): Unit = try {
        while (!stop.get()) {
          val r = c.query("stress doc", 5)
          assert(r.length === 5, s"underfilled result: ${r.map(_.id)}")
          assert(r.forall(x => x.content != null && x.content.startsWith("stress doc")))
        }
      } catch { case t: Throwable => errors.add(t) }
    }))
    writer.get(); readers.foreach(_.get()); pool.shutdown()
    assert(errors.isEmpty, s"concurrent index-path ops failed: ${errors.peek()}")
    assert(c.count() === 20)
    assert(qv.length === 16)
  }

  test("persistent-collection queries survive concurrent commits (read-committed retry)") {
    // A persistent collection's df is a live parquet view; each commit
    // swaps the directory and DELETES the displaced files. A query whose
    // scan straddles the swap dies with FileNotFoundException — the
    // readCommitted wrapper must retry it against the new snapshot, so
    // readers never see the race. (Each view's file list is pinned at
    // commit time, so results can't silently tear — only fail loudly.)
    // Races like this pass 99 runs and fail the 100th: the per-round
    // gate loops the whole scenario (fresh dir each rep) via
    // GRAFT_RC_STRESS_REPS; default 1 keeps `sbt test` fast.
    val reps = sys.env.getOrElse("GRAFT_RC_STRESS_REPS", "1").toInt
    for (rep <- 1 to reps) withClue(s"stress rep $rep/$reps: ") {
      readCommittedStressOnce()
    }
  }

  private def readCommittedStressOnce(): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft-rc").toString
    val ef = new graft.embed.HashingEmbeddingFunc(16)
    val db = graft.core.DB.persistent(spark, root, ef)
    val c = db.createCollection("rc", Map.empty, ef)
    c.addDocuments((1 to 30).map(i =>
      graft.core.Document.create(s"d$i", content = s"persistent doc number $i")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = pool.submit(new Runnable {
      def run(): Unit = try {
        (1 to 5).foreach { round =>
          c.addDocuments(Seq(graft.core.Document.create(
            s"w$round", content = s"persistent doc number $round again")))
        }
      } catch { case t: Throwable => errors.add(t) } finally stop.set(true)
    })
    val readers = (1 to 4).map(i => pool.submit(new Runnable {
      def run(): Unit = try {
        while (!stop.get()) {
          i % 3 match {
            case 0 => // point lookup + id listing take the same retry path
              assert(c.getByID("d1").content === "persistent doc number 1")
              assert(c.listIDs().size >= 30)
            case _ =>
              val r = c.query("persistent doc", 5)
              assert(r.length === 5, s"underfilled result: ${r.map(_.id)}")
              assert(r.forall(_.content.startsWith("persistent doc")))
          }
        }
      } catch { case t: Throwable => errors.add(t) }
    }))
    writer.get(); readers.foreach(_.get()); pool.shutdown()
    assert(errors.isEmpty, s"persistent concurrent query failed: ${errors.peek()}")
    assert(c.count() === 35)
  }

  test("addDF rejects null/empty ids loudly even when the row carries its own embedding") {
    // addDocuments validates driver-side, but addDF is the scale entry
    // point: a null-id row WITH an embedding used to skip every guard
    // (the content check only fires for rows needing embedding) and
    // enter state as an unaddressable id (r12 fix)
    import spark.implicits._
    val c = freshDb.createCollection("null-id")
    for (badId <- Seq(null.asInstanceOf[String], "")) withClue(s"id=$badId: ") {
      val df = withLogLevel(spark.createDataset(Seq(
        Document(badId, Map.empty, Array(1f, 0f, 0f), "has its own vector"))).toDF())
      val e = intercept[Exception] { withLogLevel(c.addDF(df)) }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(10).map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("document id is empty")), s"got: $msgs")
    }
    assert(c.count() === 0, "failed batch must not mutate state")
  }

  test("query clamps k to filtered size but errors when k > count (collection.go:505,536)") {
    val c = freshDb.createCollection("clamp")
    c.addDocuments(Seq(
      Document("1", Map("t" -> "x"), Array(1f, 0f, 0f)),
      Document("2", Map("t" -> "y"), Array(0f, 1f, 0f)),
      Document("3", Map("t" -> "x"), Array(0f, 0f, 1f))))
    // filter leaves 2 docs; k=3 allowed (clamped result)
    val r = c.queryEmbedding(Array(1f, 0f, 0f), 3, where = Map("t" -> "x"))
    assert(r.length === 2)
    assert(r.head.id === "1" && math.abs(r.head.similarity - 1f) < 1e-6)
  }

  test("queryKeyword ranks by BM25 and materializes full documents") {
    val c = freshDb.createCollection("kw")
    c.add(
      ids = Seq("1", "2", "3"),
      metadatas = Seq(Map("s" -> "a"), Map("s" -> "b"), Map("s" -> "c")),
      contents = Seq("spark spark spark engine", "spark tutorial", "nothing here"))
    val r = c.queryKeyword(Seq("spark"), 3)
    assert(r.map(_.id) === Seq("1", "2")) // doc 3 shares no term ⇒ excluded
    assert(r.head.similarity > r(1).similarity)
    assert(r.head.content === "spark spark spark engine")
    assert(r.head.metadata === Map("s" -> "a"))
    def msg(f: => Unit): String = intercept[Exception](f).getMessage
    assert(msg(c.queryKeyword(Seq.empty, 1)) === "terms is empty")
    assert(msg(c.queryKeyword(Seq("spark"), 0)) === "nResults must be > 0")
    assert(msg(c.queryKeyword(Seq("spark"), 9)) ===
      "nResults must be <= the number of documents in the collection")
  }

  test("queryMaxSim scores by best sub-vector match per query part") {
    val c = freshDb.createCollection("maxsim")
    // 4-dim = 2 sub-vectors of 2; docs pre-normalized
    val s = math.sqrt(0.5).toFloat
    c.addDocuments(Seq(
      Document("ordered", Map.empty, Array(s, 0f, 0f, s)),   // parts in order
      Document("swapped", Map.empty, Array(0f, s, s, 0f)),   // parts swapped
      Document("half", Map.empty, Array(s, 0f, s, 0f))))     // one part matches
    val q = Array(s, 0f, 0f, s)
    val r = c.queryMaxSim(q, 3, numSub = 2)
    // MaxSim is part-permutation invariant: ordered == swapped > half
    assert(r.map(_.id).toSet.contains("ordered"))
    val byId = r.map(x => x.id -> x.similarity).toMap
    assert(math.abs(byId("ordered") - byId("swapped")) < 1e-6)
    assert(byId("ordered") > byId("half"))
    def msg(f: => Unit): String = intercept[Exception](f).getMessage
    assert(msg(c.queryMaxSim(Array.empty[Float], 1)) === "queryEmbedding is empty")
    assert(msg(c.queryMaxSim(q, 0)) === "nResults must be > 0")
  }

  test("queryHybrid fuses keyword and vector evidence with RRF") {
    val db = withLogLevel(DB.inMemory(spark, new HashingEmbeddingFunc(8)))
    val c = db.createCollection("hybrid")
    c.add(
      ids = Seq("lex", "sem", "both", "none"),
      contents = Seq(
        "spark spark spark spark",     // strong lexical match only
        "completely different words",  // will match only by vector
        "spark here too",              // lexical + whatever vector
        "irrelevant filler text"))
    // query vector = embedding of the "sem" doc ⇒ sem ranks 1st semantically
    val qv = new HashingEmbeddingFunc(8).embed("completely different words")
    val r = c.queryHybrid(Seq("spark"), qv, nResults = 4)
    assert(r.nonEmpty)
    val ids = r.map(_.id)
    assert(ids.contains("sem") && ids.contains("lex"))
    // every returned similarity is a positive RRF mass ≤ 2/(rrfK+1)
    r.foreach(x => assert(x.similarity > 0f && x.similarity <= 2f / 61f + 1e-6f))
    assert(msgOf(c.queryHybrid(Seq("spark"), Array.empty[Float], 1)) ===
      "queryEmbedding is empty")
  }

  private def msgOf(f: => Unit): String = intercept[Exception](f).getMessage
}
