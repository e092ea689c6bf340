package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * k-center greedy / farthest-point selection (Gonzalez 1985; the
 * coreset selection of Sener & Savarese 2018): start from the
 * lowest-id row, then iteratively add the row whose cosine to its
 * NEAREST selected member is SMALLEST — the point farthest (in angular
 * distance) from the whole selected set. The classic
 * diversity-maximizing data-selection pass over an embedded corpus
 * (subset selection for labeling/training).
 *
 * Exactness contract: every comparison — both the per-row max over
 * centers and the global argmin — is decided on e7-scaled integers by
 * sign-aware cross-multiplication (`cos(a)=dotA/√pA < cos(b) ⟺`
 * signed `dotA²·pB <> dotB²·pA`), double fast-path with a BigInt
 * fallback for near-ties, so the selected set is a pure function of
 * the data: no float sum order, no comparison drift, identical across
 * partitionings and across the two execution tiers. Final ties break
 * by id ascending. Zero-norm rows rank as cos = 0.
 *
 * Scale shape: the greedy is inherently sequential in k, so the corpus
 * work is k ROUNDS of (broadcast ≤k centers → one scan computing each
 * row's nearest-center witness → per-partition exact argmin → driver merge of
 * ≤ numPartitions winners). Each round is stateless (the witness is
 * recomputed against the broadcast set — O(k·d) per row — rather than
 * threading a mutable per-row state through k checkpoints: no lineage
 * growth, no cache lifecycle, and k²·d per-row total cost is the
 * accepted k-center envelope at selection-sized k). Below
 * `localMaxElems` scaled elements the corpus collects once and the
 * same greedy runs driver-local — bit-identical by the shared
 * comparator (spec-pinned).
 */
object Coreset {

  /** Default driver-local tier bound: 200M longs ≈ 1.6 GB. */
  val LocalMaxElems: Long = 200L * 1000 * 1000

  /** Returns (idCol, rank) — rank is 1-based selection order. */
  def kCenterSelect(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      scale: Long = 10000000L,
      localMaxElems: Long = LocalMaxElems): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base: Dataset[(Long, Array[Long], Long)] = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"),
        graft.functions.ColumnMath.scaledLongs(col(vecCol), scale))
      .as[(Long, Array[Long])]
      .map { case (id, e7) =>
        var i = 0; var n2 = 0L
        while (i < e7.length) { n2 += e7(i) * e7(i); i += 1 }
        (id, e7, n2)
      }
    // dim from a NON-NULL row: the unfiltered first row can carry a
    // null embedding (base filters them out two lines up), which would
    // NPE here — or, under legacy sizeOfNull, yield dim = −1 and
    // silently route any corpus into the driver-local tier
    val dimRows = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    require(dimRows.nonEmpty,
      "kCenterSelect needs at least one non-null vector")
    val dim = dimRows(0).getInt(0)
    val n = base.count()
    val selected =
      if (n * dim <= localMaxElems) greedyLocal(base.collect(), k)
      else greedyDistributed(base, k, n)
    spark.createDataFrame(selected.zipWithIndex.map {
      case (id, i) => (id, (i + 1).toLong)
    }).toDF(idCol, "rank")
  }

  // ---- shared exact comparator ------------------------------------------

  /** Compare cosA = dotA/√pA vs cosB = dotB/√pB (pA, pB ≥ 0 products of
    * two norms, passed as the factors to keep longs): sign first, then
    * cross-multiplied magnitudes; double fast-path, BigInt fallback.
    * Zero norms compare as cos = 0. */
  private[graft] def compareCos(
      dotA: Long, ua: Long, va: Long,
      dotB: Long, ub: Long, vb: Long): Int = {
    val da = if (ua == 0L || va == 0L) 0L else dotA
    val db = if (ub == 0L || vb == 0L) 0L else dotB
    val sa = java.lang.Long.signum(da)
    val sb = java.lang.Long.signum(db)
    if (sa != sb) return Integer.compare(sa, sb)
    if (sa == 0) return 0
    // same nonzero sign: |cosA| <> |cosB| ⟺ dotA²·pB <> dotB²·pA,
    // flipped when both negative
    val lhs = da.toDouble * da.toDouble * ub.toDouble * vb.toDouble
    val rhs = db.toDouble * db.toDouble * ua.toDouble * va.toDouble
    val tol = 1e-9 * math.max(math.abs(lhs), math.abs(rhs))
    val cmp =
      if (lhs - rhs > tol) 1
      else if (rhs - lhs > tol) -1
      else {
        val l = BigInt(da) * BigInt(da) * BigInt(ub) * BigInt(vb)
        val r = BigInt(db) * BigInt(db) * BigInt(ua) * BigInt(va)
        l.compare(r)
      }
    if (sa > 0) cmp else -cmp
  }

  /** Nearest-center witness of row (e7, n2): the (dot, centerN2) pair
    * realizing the LARGEST cosine over the center set — angular
    * distance to the set is distance to the nearest member, i.e. the
    * max cosine. The row's own norm is common to all candidates and
    * cancels in the comparison. */
  private def maxWitness(
      e7: Array[Long], n2: Long,
      centers: Array[(Array[Long], Long)]): (Long, Long) = {
    var bd = 0L; var bn = 0L; var first = true
    var c = 0
    while (c < centers.length) {
      val (ce, cn) = centers(c)
      var i = 0; var d = 0L
      while (i < e7.length) { d += e7(i) * ce(i); i += 1 }
      if (first || compareCos(d, n2, cn, bd, n2, bn) > 0) {
        bd = d; bn = cn; first = false
      }
      c += 1
    }
    (bd, bn)
  }

  /** True iff row a (witness wa over na2) is FARTHER from the selected
    * set than row b — nearest-center cos(a) < nearest-center cos(b) —
    * with id ascending on exact ties. */
  private def fartherThan(
      ida: Long, wa: (Long, Long), na2: Long,
      idb: Long, wb: (Long, Long), nb2: Long): Boolean = {
    val cmp = compareCos(wa._1, na2, wa._2, wb._1, nb2, wb._2)
    cmp < 0 || (cmp == 0 && ida < idb)
  }

  // ---- tiers -------------------------------------------------------------

  private def greedyLocal(
      rows: Array[(Long, Array[Long], Long)], k: Int): Seq[Long] = {
    require(rows.nonEmpty, "kCenterSelect needs at least one row")
    val sorted = rows.sortBy(_._1)
    val centers = scala.collection.mutable.ArrayBuffer(
      (sorted.head._2, sorted.head._3))
    val picked = scala.collection.mutable.ArrayBuffer(sorted.head._1)
    val pickedSet = scala.collection.mutable.HashSet(sorted.head._1)
    var exhausted = false
    while (!exhausted && picked.length < math.min(k, sorted.length)) {
      // hoist: centers.toArray inside the per-row loop allocated a copy
      // per candidate row per round — O(n·k²) garbage at the local-tier
      // ceiling (the distributed tier already reads one broadcast array)
      val cs = centers.toArray
      var bestId = -1L; var bestW = (0L, 0L); var bestN2 = 0L; var any = false
      var bestE7: Array[Long] = null
      for ((id, e7, n2) <- sorted if !pickedSet.contains(id)) {
        val w = maxWitness(e7, n2, cs)
        if (!any || fartherThan(id, w, n2, bestId, bestW, bestN2)) {
          bestId = id; bestW = w; bestN2 = n2; bestE7 = e7; any = true
        }
      }
      // DUPLICATE ids can exhaust the distinct-id pool before the
      // row-count bound: stop with the distinct selections instead of
      // the old opaque find(-1).get NoSuchElementException
      if (!any) exhausted = true
      else {
        picked += bestId
        pickedSet += bestId
        // carry the WINNING row's own vector (mirror of the distributed
        // tier's bestE7): re-finding by id on duplicate-id inputs could
        // append a different same-id row's vector than the one whose
        // witness won, diverging the two tiers' center sets
        centers += ((bestE7, bestN2))
      }
    }
    picked.toSeq
  }

  private def greedyDistributed(
      base: Dataset[(Long, Array[Long], Long)], k: Int, n: Long): Seq[Long] = {
    require(n > 0, "kCenterSelect needs at least one row")
    val spark = base.sparkSession
    import spark.implicits._
    // materialize once; rounds re-scan blocks, not lineage
    val cached = base.localCheckpoint(true)
    try {
      val seed = cached.orderBy(col("_1")).limit(1)
        .collect()(0)
      val picked = scala.collection.mutable.ArrayBuffer(seed._1)
      val centers = scala.collection.mutable.ArrayBuffer((seed._2, seed._3))
      var exhausted = false
      while (!exhausted && picked.length < math.min(k, n).toInt) {
        val bc = spark.sparkContext.broadcast(centers.toArray)
        val pickedSet = picked.toSet
        // one partial winner per partition (exact comparator), merged
        // exactly on the driver: the exchange is ≤ numPartitions rows.
        // The winner CARRIES its e7 vector (numPartitions × dim longs —
        // still tiny): re-fetching it with a filter ran a SECOND full
        // corpus scan every round, doubling the k-round cost
        val winners = cached.mapPartitions { it =>
          var bestId = -1L; var bestW = (0L, 0L); var bestN2 = 0L
          var bestE7: Array[Long] = null
          var any = false
          for ((id, e7, n2) <- it if !pickedSet.contains(id)) {
            val w = maxWitness(e7, n2, bc.value)
            if (!any || fartherThan(id, w, n2, bestId, bestW, bestN2)) {
              bestId = id; bestW = w; bestN2 = n2; bestE7 = e7; any = true
            }
          }
          if (any) Iterator.single((bestId, bestW._1, bestW._2, bestN2, bestE7))
          else Iterator.empty
        }.collect()
        // duplicate ids can exhaust the distinct pool early — stop with
        // the distinct selections (see greedyLocal)
        if (winners.isEmpty) exhausted = true
        else {
          val best = winners.reduceLeft { (a, b) =>
            if (fartherThan(a._1, (a._2, a._3), a._4, b._1, (b._2, b._3), b._4)) a
            else b
          }
          picked += best._1
          centers += ((best._5, best._4))
        }
        bc.destroy()
      }
      picked.toSeq
    } finally cached.unpersist()
  }
}
