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

  /** The "first `sampleSize` DISTINCT vectors in seeded-hash order"
    * training sample — shared by IVF centroid training, PQ codebook
    * training, and IVF-PQ residual training (Pq.train previously used a
    * lexicographic orderBy prefix: layout-invariant but BIASED — all
    * sampled vectors share minimal leading components — and on a
    * duplicate-heavy corpus the whole sample filled with copies of the
    * smallest vectors, collapsing the codebook; this definition is the
    * one the comments below justify). Driver memory O(sample·d). */
  private[ops] def seededDistinctSample(
      df: DataFrame,
      vecCol: String,
      sampleSize: Int,
      seed: Long): Array[Array[Float]] = {
    val frac = math.min(1.0, sampleSize.toDouble /
      math.max(1L, df.count()).toDouble * 1.2)
    val base = df.select(vecCol).filter(col(vecCol).isNotNull)
    // The training sample is "the first `sampleSize` DISTINCT vectors in
    // seeded-hash order" — a pure function of the data multiset:
    //  * NOT sample(): its per-partition RNG makes membership depend on
    //    the file layout, so a 3-file and a 300-file copy of the same
    //    corpus trained different centroids (and different durable
    //    partitionBy(__cell) layouts). Per-copy distinctions CANNOT be
    //    layout-invariant — two identical rows are indistinguishable
    //    across layouts — so the invariant unit is the distinct value.
    //  * DISTINCT, not per-row: duplicates add no centroid variety
    //    (k-means slots spent on copies just re-weight one point), and
    //    value-level hash membership keeps either ALL copies or none, so
    //    a duplicate-heavy corpus would collapse to frac·distinct points.
    //    DELIBERATE TRADEOFF: distinct training drops multiplicity
    //    weighting — on a duplicate-skewed corpus the centroids track
    //    the distinct-value geometry, not the row density, so cells
    //    balance by value count rather than row count (copies of one
    //    vector always land in ONE cell regardless). We pin
    //    multiplicity-INVARIANCE (duplicating rows never moves
    //    centroids — IvfIndexSpec) as the stronger reproducibility
    //    property; if row-density-aware cells ever matter more, the
    //    layout-invariant alternative is weighted k-means over
    //    (distinct vector, count) pairs from groupBy(vecCol).count —
    //    NOT a return to sample().
    //  * hash order, not lexicographic (the Pq.train convention): a
    //    lexicographic prefix keeps the smallest first components and
    //    measurably degrades the trained cells. One SEEDED hash serves as
    //    both the membership threshold and the sort key, so the
    //    thresholded result, when full, EQUALS the unfiltered one — the
    //    prefilter is purely a cost optimization.
    // isNotNull above: a null embedding in the sample NPE'd the collect.
    val sampleHash = xxhash64(lit(seed), col(vecCol))
    def takeDistinct(src: DataFrame): Array[Array[Float]] = src
      .dropDuplicates(Seq(vecCol)) // map-side partial dedup before the shuffle
      .orderBy(sampleHash, col(vecCol)).limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    val thresholded =
      if (frac >= 1.0) takeDistinct(base)
      else {
        val cutoff = (BigDecimal(2).pow(64) * frac +
          BigDecimal(Long.MinValue)).setScale(0, BigDecimal.RoundingMode.FLOOR)
          .toLong
        takeDistinct(base.filter(sampleHash <= lit(cutoff)))
      }
    // Underfilled threshold (expected when duplicates push the distinct
    // count below rows/1.2): widen to the full corpus. Same expression,
    // so the result is the same "first sampleSize distinct by hash"
    // prefix, just past the cutoff — dedup stays partial-aggregated and
    // the sort is a bounded per-partition top-k + driver merge.
    if (frac >= 1.0 || thresholded.length >= sampleSize) thresholded
    else takeDistinct(base)
  }

  /** Train centroids: seeded-distinct sample + Lloyd iterations on the
    * driver. Sample is bounded (`sampleSize`), so driver memory is
    * O(sample·d), never O(corpus). */
  def trainCentroids(
      df: DataFrame,
      vecCol: String,
      nlist: Int,
      sampleSize: Int = 10000,
      iterations: Int = 8,
      seed: Long = 42L): Array[Array[Float]] = {
    val sample = seededDistinctSample(df, vecCol, sampleSize, seed)
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
    * probe touches only the partitions of its cells. Null vectors are
    * EXCLUDED from the layout: cellColumn's dot is null for them, so
    * greatest's struct comparison would decide purely on the index
    * tie-break and silently pile every embedding-less row (allowed by
    * the corpus schema — embed-on-write) into cell 0, skewing that
    * cell's durable partition and surfacing null similarities in any
    * probe that touches it. Training (trainCentroids) and every probe
    * already filter the same way. */
  def assign(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Float]],
      partitionsPerCell: Int = 1): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .withColumn("__cell", cellColumn(col(vecCol), centroids))
      .repartition(centroids.length * partitionsPerCell, col("__cell"))

  /** Probe: exact top-k within the `nprobe` cells nearest to the query.
    * `precision` ranks the probed candidates with the f32 hot-path
    * kernel (default) or exact f64 — see [[AnnIndex.rankScore]]. */
  def topK(
      assigned: DataFrame,
      vecCol: String,
      centroids: Array[Array[Float]],
      queryVec: Array[Float],
      k: Int,
      idCol: String,
      nprobe: Int = 2,
      precision: String = "f32"): DataFrame = {
    val byScore = centroids.zipWithIndex
      .map { case (c, i) => (VectorFunctions.dot(queryVec, c), i) }
      .sortBy(-_._1).map(_._2).take(nprobe)
    assigned
      .filter(col("__cell").isInCollection(byScore.toIndexedSeq))
      .withColumn("similarity", AnnIndex.rankScore(col(vecCol), queryVec, precision))
      .orderBy(desc("similarity"), asc(idCol))
      .limit(k)
      .drop("__cell")
  }
}
