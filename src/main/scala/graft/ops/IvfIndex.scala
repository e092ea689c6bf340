package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.dot_const_f32

/**
 * IVF (inverted-file) approximate nearest neighbor — the classic
 * cluster-then-probe scale path (Sivic/Zisserman video-google lists;
 * FAISS IVF-Flat shape): k-means centroids partition the corpus into
 * `nlist` cells; a query scans only the `nprobe` nearest cells.
 *
 * Spark-first layout: centroids are trained driver-side on a bounded
 * sample (deterministic seed), then cell assignment is a per-row argmax
 * over `nlist` codegen'd dot products — a map-only projection. The
 * assigned DataFrame is repartitioned BY CELL so each probe reads whole
 * partitions; at 100 TB this is a partition-pruned scan of
 * nprobe/nlist of the corpus instead of all of it.
 */
object IvfIndex {

  /** Train centroids: seeded sample + Lloyd iterations on the driver.
    * Sample is bounded (`sampleSize`), so driver memory is O(sample·d),
    * never O(corpus). */
  def trainCentroids(
      df: DataFrame,
      vecCol: String,
      nlist: Int,
      sampleSize: Int = 10000,
      iterations: Int = 8,
      seed: Long = 42L): Array[Array[Float]] = {
    val frac = math.min(1.0, sampleSize.toDouble /
      math.max(1L, df.count()).toDouble * 1.2)
    val base = df.select(vecCol).filter(col(vecCol).isNotNull)
    // Membership by seeded-hash threshold, NOT sample(): sample() draws
    // from a per-partition RNG, so which rows it keeps depends on the
    // file layout — the trained centroids, and the durable
    // partitionBy(__cell) layout derived from them, would differ between
    // a 3-file and a 300-file copy of the same corpus. Keeping rows whose
    // hash falls below a fraction-derived cutoff makes membership a pure
    // function of the data (the same layout-invariance contract as the
    // md5 split family in ops/Splits.scala).
    val picked =
      if (frac >= 1.0) base
      else {
        val cutoff = (BigDecimal(2).pow(64) * frac +
          BigDecimal(Long.MinValue)).setScale(0, BigDecimal.RoundingMode.FLOOR)
          .toLong
        base.filter(xxhash64(lit(seed), col(vecCol)) <= lit(cutoff))
      }
    // orderBy before limit (the Pq.train convention): a bare limit takes
    // whichever partitions answer first. Ordered by a HASH of the vector,
    // not the raw value: a lexicographic order would keep a biased prefix
    // (smallest first components) of the thresholded sample and
    // measurably degrade the trained cells. isNotNull above: a null
    // embedding in the sample NPE'd the collect with no context.
    def takeOrdered(src: DataFrame): Array[Array[Float]] = src
      .orderBy(xxhash64(col(vecCol)), col(vecCol)).limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    val thresholded = takeOrdered(picked)
    // The threshold decides membership per distinct VALUE (all copies of
    // a vector share one hash), so a duplicate-heavy corpus — 100k rows
    // over 40 distinct embeddings — passes only frac·distinct values and
    // can underfill or even empty the sample where per-row sampling never
    // did. Underfilled ⇒ drop the prefilter and TakeOrdered the full
    // corpus (still a pure function of the data: per-partition top-k +
    // driver merge, never a global sort/shuffle).
    val sample =
      if (frac >= 1.0 || thresholded.length >= sampleSize) thresholded
      else takeOrdered(base)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val dim = sample.head.length
    val rnd = new java.util.Random(seed)
    var centroids = Array.fill(nlist)(sample(rnd.nextInt(sample.length)).clone())
    for (_ <- 1 to iterations) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) sample(rnd.nextInt(sample.length)).clone()
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }.toArray
    }
    centroids
  }

  private def nearestCentroid(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestScore = Float.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      // max dot == min angle for normalized corpora (the chromem invariant)
      var s = 0.0f; var i = 0
      while (i < v.length) { s += v(i) * centroids(c)(i); i += 1 }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** Cell id as a Column: argmax over nlist codegen'd dot products —
    * pure expressions, runs inside whole-stage codegen. */
  def cellColumn(vecCol: Column, centroids: Array[Array[Float]]): Column = {
    // the index is NEGATED so greatest's struct ordering breaks dot
    // ties toward the FIRST cell — the same first-wins rule as
    // nearestCentroid and the probe's stable sort; ties are real when
    // with-replacement seeding duplicates a centroid, and a mismatched
    // rule sends every tied row to a cell the probe ranks last
    val scored = centroids.zipWithIndex.map { case (cent, i) =>
      struct(dot_const_f32(vecCol, cent).as("s"), lit(-i).as("c"))
    }
    -greatest(scored.toIndexedSeq: _*).getField("c")
  }

  /** Assign each row to its cell and cluster the layout by cell, so a
    * probe touches only the partitions of its cells. */
  def assign(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Float]],
      partitionsPerCell: Int = 1): DataFrame =
    df.withColumn("__cell", cellColumn(col(vecCol), centroids))
      .repartition(centroids.length * partitionsPerCell, col("__cell"))

  /** Probe: exact top-k within the `nprobe` cells nearest to the query. */
  def topK(
      assigned: DataFrame,
      vecCol: String,
      centroids: Array[Array[Float]],
      queryVec: Array[Float],
      k: Int,
      idCol: String,
      nprobe: Int = 2): DataFrame = {
    val byScore = centroids.zipWithIndex
      .map { case (c, i) => (VectorFunctions.dot(queryVec, c), i) }
      .sortBy(-_._1).map(_._2).take(nprobe)
    assigned
      .filter(col("__cell").isInCollection(byScore.toIndexedSeq))
      .withColumn("similarity", dot_const_f32(col(vecCol), queryVec))
      .orderBy(desc("similarity"), asc(idCol))
      .limit(k)
      .drop("__cell")
  }
}
