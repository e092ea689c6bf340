package graft

import org.apache.spark.sql.functions._

import graft.ops.Coreset

class CoresetSpec extends SparkSuite {
  import spark.implicits._

  private def randomDf(n: Int, d: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(d)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
  }

  /** Independent reference greedy: BigInt-ONLY comparisons (no double
    * fast path) — also validates the fast path's tolerance routing. */
  private def bruteForce(rows: Seq[(Long, Array[Float])], k: Int,
      scale: Double = 1e7): Seq[Long] = {
    val e7 = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * scale))
    }.sortBy(_._1)
    def n2(a: Array[Long]) = a.map(x => BigInt(x) * BigInt(x)).sum
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map(p => BigInt(p._1) * BigInt(p._2)).sum
    // cos = dot/√(na·nb) compared via sign + cross-multiplied squares
    def cmp(d1: BigInt, p1: BigInt, d2: BigInt, p2: BigInt): Int = {
      val v1 = if (p1 == 0) BigInt(0) else d1
      val v2 = if (p2 == 0) BigInt(0) else d2
      val s = v1.signum compare v2.signum
      if (s != 0) s
      else if (v1.signum == 0) 0
      else {
        val m = (v1 * v1 * p2) compare (v2 * v2 * p1)
        if (v1.signum > 0) m else -m
      }
    }
    val picked = scala.collection.mutable.ArrayBuffer(e7.head._1)
    while (picked.length < math.min(k, e7.length)) {
      val centers = picked.map(id => e7.find(_._1 == id).get._2)
      val best = e7.filterNot(r => picked.contains(r._1)).map { case (id, v) =>
        val nv = n2(v)
        // distance-to-set = distance to the NEAREST member ⇒ max cosine
        val maxW = centers.map { c =>
          (dot(v, c), nv * n2(c))
        }.reduceLeft((a, b) => if (cmp(a._1, a._2, b._1, b._2) >= 0) a else b)
        (id, maxW)
      }.reduceLeft { (a, b) =>
        val c = cmp(a._2._1, a._2._2, b._2._1, b._2._2)
        if (c < 0 || (c == 0 && a._1 < b._1)) a else b
      }
      picked += best._1
    }
    picked.toSeq
  }

  test("kCenterSelect ≡ BigInt-only brute force (local tier)") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val got = Coreset.kCenterSelect(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 12)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(got === bruteForce(rows, 12))
  }

  test("gate config (scale=1e4) ≡ BigInt-only brute force at 1e4") {
    // the emb_coreset gate pins scale=1e4 so its DuckDB oracle's
    // cross-multiplied compares fit HUGEINT; exactness must hold at
    // that scale too (the contract is scale-independent)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val got = Coreset.kCenterSelect(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 12, scale = 10000L)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(got === bruteForce(rows, 12, scale = 1e4))
  }

  test("distributed tier ≡ local tier, partitioning-invariant") {
    val df = randomDf(80, 6, seed = 17)
    val local = Coreset.kCenterSelect(df, "embedding", "vec_id", k = 10)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    // localMaxElems = 0 forces the round-based distributed tier
    val dist1 = Coreset.kCenterSelect(df.repartition(7), "embedding", "vec_id",
        k = 10, localMaxElems = 0)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    val dist2 = Coreset.kCenterSelect(df.repartition(2), "embedding", "vec_id",
        k = 10, localMaxElems = 0)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(dist1 === local)
    assert(dist2 === local)
  }

  test("k-center picks one representative per planted cluster") {
    // three tight angular clusters around orthogonal axes
    val rnd = new scala.util.Random(29)
    def near(axis: Int): Array[Float] =
      Array.tabulate(6)(i =>
        (if (i == axis) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.05f)
    val rows = (0 until 30).map(i => (i.toLong, near(i % 3)))
    val got = Coreset.kCenterSelect(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_ % 3) === Set(0L, 1L, 2L),
      s"selected $got must cover all three clusters")
  }

  test("first pick is the lowest id; k clamps to row count") {
    val df = randomDf(5, 4, seed = 41)
    val got = Coreset.kCenterSelect(df, "embedding", "vec_id", k = 99)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(got.length === 5)
    assert(got.head === 0L)
    assert(got.toSet.size === 5)
  }

  test("duplicate ids exhaust the pool gracefully — distinct picks, no opaque crash (r12)") {
    import spark.implicits._
    // 3 rows, 2 distinct ids, k=3: the loop bound counted ROWS while
    // selection exhausts distinct ids — the old code crashed on
    // find(-1).get / reduceLeft-on-empty
    val dup = withLogLevel(Seq(
      (1L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f))
    ).toDF("vec_id", "embedding"))
    val picks = graft.ops.Coreset.kCenterSelect(dup, "embedding", "vec_id", k = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(picks.distinct === picks)
    assert(picks.toSet === Set(1L, 2L), s"got $picks")
  }

  test("duplicate-id winner carries its OWN vector — local ≡ distributed (r13)") {
    import spark.implicits._
    // id 1 appears twice with very different vectors, the FARTHER row
    // (0,1) listed SECOND: the old local tier picked the winner by
    // witness but re-fetched the center vector by find(_._1 == id),
    // which returned the FIRST same-id row (0.707,0.707) — and with
    // that wrong center the third pick flips from id 2 to id 3. The
    // fixed local tier must carry the winning row's own vector and
    // agree with the distributed tier.
    val s = math.sqrt(0.5).toFloat
    val rows = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(s, s)),      // first same-id row (NOT the witness winner)
      (1L, Array(0f, 1f)),    // the winner: cos 0 to the seed
      (2L, Array(s, s)),
      (3L, Array(0.3827f, 0.9239f)))
    val df = withLogLevel(rows.toDF("vec_id", "embedding"))
    val local = graft.ops.Coreset.kCenterSelect(df.coalesce(1), "embedding", "vec_id", k = 3)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    val dist = graft.ops.Coreset.kCenterSelect(df.repartition(3), "embedding", "vec_id",
        k = 3, localMaxElems = 0)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(local === Seq(0L, 1L, 2L), s"local picked $local")
    assert(dist === local, s"tiers diverged: local=$local dist=$dist")
  }

  test("an all-null corpus fails with the diagnostic message, not NoSuchElement (r12)") {
    import spark.implicits._
    val empty = withLogLevel(Seq((1L, None: Option[Array[Float]]))
      .toDF("vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Coreset.kCenterSelect(empty, "embedding", "vec_id", k = 2)
    }
    assert(e.getMessage.contains("non-null vector"))
  }
}
