package graft

import java.nio.file.Files

import graft.persist.SnapshotStore

class SnapshotStoreSpec extends SparkSuite {
  import spark.implicits._

  test("commit/read round-trips versions; old versions stay readable") {
    val root = Files.createTempDirectory("snap").toString
    val st = new SnapshotStore(root)
    assert(st.versions.isEmpty && st.latestVersion.isEmpty)

    val v1 = st.commit(withLogLevel(Seq((1L, "a"), (2L, "b")).toDF("id", "x")))
    val v2 = st.commit(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "x"))
    assert(v1 === 1L && v2 === 2L && st.latestVersion === Some(2L))

    // time travel: v1 unchanged after v2 commit
    val r1 = st.read(spark, 1L).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(r1 === Set((1L, "a"), (2L, "b")))
    val latest = st.readLatest(spark).collect().map(_.getLong(0)).toSet
    assert(latest === Set(1L, 2L, 3L))
  }

  test("diff labels added/removed/changed rows by id") {
    val root = Files.createTempDirectory("snap").toString
    val st = new SnapshotStore(root)
    st.commit(withLogLevel(Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("id", "x")))
    st.commit(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "x"))
    val d = st.diff(spark, 1L, 2L, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "changed", 3L -> "added", 4L -> "removed"))
  }

  test("prune keeps the newest versions and the latest-pointer target") {
    val root = Files.createTempDirectory("snap").toString
    val st = new SnapshotStore(root)
    (1 to 4).foreach(i => st.commit(Seq((i.toLong, "x")).toDF("id", "x")))
    val dropped = st.prune(2)
    assert(dropped === Seq(1L, 2L))
    assert(st.versions === Seq(3L, 4L))
    // pruned versions are gone, retained ones readable
    intercept[IllegalArgumentException](st.read(spark, 1L))
    assert(st.read(spark, 3L).count() === 1L)
  }

  test("a crashed writer's tmp dir is invisible and does not block commits") {
    val root = Files.createTempDirectory("snap").toString
    val st = new SnapshotStore(root)
    st.commit(withLogLevel(Seq((1L, "x")).toDF("id", "x")))
    Files.createDirectories(java.nio.file.Paths.get(root, "v00000002.tmp"))
    assert(st.versions === Seq(1L))
    assert(st.commit(Seq((2L, "y")).toDF("id", "x")) === 2L)
    assert(st.read(spark, 2L).count() === 1L)
  }

  test("torn commit (data-dir moved, pointer not swapped) stays unpublished") {
    // the OTHER crash window: the v<n> rename completed but the process
    // died before _latest.json moved. Contract (see latestVersion doc):
    // readers never observe the orphan — the pointer is the read source
    // of truth — while the listing remains the allocation counter, so
    // the next commit skips PAST the orphan rather than reusing or
    // clobbering its number.
    val root = Files.createTempDirectory("snap").toString
    val st = new SnapshotStore(root)
    st.commit(withLogLevel(Seq((1L, "committed")).toDF("id", "x")))

    // simulate the torn commit of v2: a completed data directory exactly
    // where the rename would land it, with no pointer swap
    Seq((99L, "orphaned")).toDF("id", "x").write
      .parquet(java.nio.file.Paths.get(root, "v00000002").toString)

    // readers: pointer rules — latest is still v1
    assert(st.latestVersion === Some(1L))
    assert(st.readLatest(spark).collect().map(_.getLong(0)).toSet === Set(1L))
    // listing: the orphan is allocated (visible to the counter)
    assert(st.versions === Seq(1L, 2L))
    // explicit time-travel to the orphan remains possible (audit path)
    assert(st.read(spark, 2L).collect().map(_.getLong(0)).toSet === Set(99L))
    // recovery: the next commit allocates PAST the orphan and publishes
    val v = st.commit(Seq((3L, "recovered")).toDF("id", "x"))
    assert(v === 3L)
    assert(st.latestVersion === Some(3L))
    assert(st.readLatest(spark).collect().map(_.getLong(0)).toSet === Set(3L))
    assert(st.versions === Seq(1L, 2L, 3L))
  }

  test("concurrent committers on one store serialize: distinct versions, no lost update") {
    val root = Files.createTempDirectory("snap").toString
    val st = new SnapshotStore(root)
    val frames = (1 to 4).map(i => Seq((i.toLong, s"w$i")).toDF("id", "x"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // unsynchronized, both threads allocate the same version from the
    // directory listing and one commit is silently lost / half-published
    val versions = Await.result(
      Future.sequence(frames.map(f => Future(st.commit(f)))), 120.seconds)
    assert(versions.sorted === Seq(1L, 2L, 3L, 4L))
    assert(st.versions === Seq(1L, 2L, 3L, 4L))
    assert(st.latestVersion === Some(4L))
    // every version is a complete, readable dataset
    (1L to 4L).foreach(v => assert(st.read(spark, v).count() === 1L))
    // no leaked tmp dirs
    val leftovers = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(root))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".tmp")).toSeq
      finally s.close()
    }
    assert(leftovers.isEmpty, s"leaked tmp entries: $leftovers")
  }

  test("prune retention counts published versions only — an orphaned commit dir cannot evict a real one (r12)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val store = new graft.persist.SnapshotStore(root)
    (1 to 3).foreach(i => store.commit(Seq((i.toLong, s"v$i")).toDF("id", "x")))
    // simulate a crashed commit: an allocated version dir ABOVE the
    // pointer, never published
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "v00000004"))
    val dropped = store.prune(keepLast = 2)
    assert(dropped === Seq(1L), s"dropped $dropped")
    // v2 (a real published version inside the retention window) is
    // readable — the old row-count-based keep set evicted it because
    // the orphan dir occupied a slot
    assert(store.read(spark, 2L).count() === 1L)
    assert(store.read(spark, 3L).count() === 1L)
    // the orphan stays on disk (owned by the in-flight commit protocol)
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, "v00000004")))
  }
}
