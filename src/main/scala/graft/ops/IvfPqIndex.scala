package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.{ivfpq_adc, ivfpq_encode}

/**
 * IVF-PQ: the canonical billion-vector index (FAISS's IVFPQ shape —
 * Jégou et al., TPAMI 2011). Coarse cells (IVF) bound how much of the
 * corpus a probe reads; product-quantized RESIDUALS (v − cell centroid)
 * bound how many bytes per row it reads. Composition of this repo's
 * [[IvfIndex]] (cells, partition-pruned layout) and [[Pq]] (codes, ADC),
 * with residual encoding fused into one codegen'd kernel so the corpus
 * pass stays map-only.
 *
 * Score ≈ q·x = q·cell_centroid + q·decode(residual code): the first
 * term is one lookup per row, the second `m` lookups — no float math on
 * the corpus. Exact re-rank joins the float column back for candidates
 * only.
 *
 * At 100 TB: the durable layout is `partitionBy(__cell)` parquet of
 * (id, cell, m-int code) — a probe at nprobe/nlist cells reads that
 * fraction of files, each row m ints instead of d floats (~256× less
 * scan volume at d=1536, m=16, nprobe/nlist=1/16).
 */
object IvfPq {

  /** Train cells on the corpus sample, then the PQ codebook on the
    * RESIDUALS of that sample (the residual distribution is what the
    * codes must cover — codebooks trained on raw vectors waste their
    * resolution re-encoding the cell centroid). */
  def build(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nlist: Int = 16,
      m: Int = 8,
      k: Int = 16,
      sampleSize: Int = 10000,
      seed: Long = 42L): IvfPqIndex = {
    val cellsF = IvfIndex.trainCentroids(df, vecCol, nlist, sampleSize, seed = seed)
    val dim = cellsF.head.length
    val cells = cellsF.map(_.map(_.toDouble))
    // the shared seeded-distinct sample (see Pq.train for why the old
    // lexicographic prefix was biased and duplicate-fragile)
    val sample = IvfIndex.seededDistinctSample(df, vecCol, sampleSize, seed)
    val residuals = sample.map { v =>
      var best = 0; var bestS = Double.NegativeInfinity
      var c = 0
      while (c < nlist) {
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i).toDouble * cells(c)(i); i += 1 }
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      Array.tabulate(dim)(i => v(i).toDouble - cells(best)(i))
    }
    val cb = Pq.trainOnSamples(residuals, dim, m, k)
    fromParams(df, vecCol, idCol, cells, cb)
  }

  /** Assemble an index from explicit parameters (tests / replayable
    * pipelines use seeded-random codebooks here). */
  def fromParams(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      cells: Array[Array[Double]],
      cb: Pq.Codebook): IvfPqIndex = {
    require(cells.nonEmpty && cells.forall(_.length == cb.dim),
      "every cell centroid must have length m*subDim")
    val flatCells = cells.flatten
    val enc = df
      .withColumn("__enc", ivfpq_encode(col(vecCol), flatCells, cells.length,
        cb.flat, cb.m, cb.k, cb.subDim))
      .select(col(idCol), col(vecCol),
        col("__enc").getField("cell").as("__cell"),
        col("__enc").getField("code").as("__code"))
      .repartition(cells.length, col("__cell"))
    new IvfPqIndex(enc, cells, cb, vecCol, idCol)
  }

  /** Re-open a layout written by [[IvfPqIndex.save]]. */
  def load(spark: SparkSession, path: String): IvfPqIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val m = meta.getInt(1); val k = meta.getInt(2); val subDim = meta.getInt(3)
    val cb = Pq.Codebook(m, k, subDim, meta.getSeq[Double](4).toArray)
    val nlist = meta.getInt(0)
    val flatCells = meta.getSeq[Double](5).toArray
    val cells = Array.tabulate(nlist)(c =>
      java.util.Arrays.copyOfRange(flatCells, c * m * subDim, (c + 1) * m * subDim))
    new IvfPqIndex(spark.read.parquet(s"$path/cells"), cells, cb,
      meta.getString(6), meta.getString(7))
  }
}

/** Materialized IVF-PQ index (see [[IvfPq.build]]). */
final class IvfPqIndex private[ops] (
    val encoded: DataFrame,
    val cells: Array[Array[Double]],
    val cb: Pq.Codebook,
    vecCol: String,
    idCol: String) {

  def nlist: Int = cells.length

  private def cellDots(q: Array[Float]): Array[Double] =
    cells.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += q(i).toDouble * c(i); i += 1 }
      s
    }

  /**
   * ADC top-k over the `nprobe` best cells: partition-pruned scan of the
   * code column, one cell-dot lookup + m table lookups per row, bounded
   * top-k. `nprobe = nlist` scans every cell (the oracle-checkable
   * configuration: ranking is then the full ADC ordering).
   */
  def topK(queryVec: Array[Float], k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0, "need k > 0 and nprobe > 0")
    // adcTable first: it validates the query length before cellDots
    // would index out of bounds. The residual table is built against the
    // RAW query: q·decode(code) terms use the same codebook the
    // residuals were encoded with.
    val table = Pq.adcTable(queryVec, cb)
    val dots = cellDots(queryVec)
    val probed = dots.zipWithIndex.sortBy(-_._1).map(_._2).take(nprobe)
    encoded
      .filter(col("__cell").isInCollection(probed.toIndexedSeq))
      .withColumn("qsim",
        ivfpq_adc(struct(col("__cell").as("cell"), col("__code").as("code")),
          dots, table, cb.m, cb.k))
      .orderBy(desc("qsim"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("qsim"))
  }

  /** ADC first pass + exact re-rank over the float column (candidates
    * only). */
  def topKRerank(queryVec: Array[Float], k: Int, nprobe: Int, rerankK: Int): DataFrame = {
    require(rerankK >= k, "rerankK must be >= k")
    require(encoded.columns.contains(vecCol),
      s"re-rank needs the float column '$vecCol', which the durable layout " +
        "does not store — re-rank against the source table, or use an index " +
        "built in-session via IvfPq.build/fromParams")
    VectorSearch.exactRerank(encoded, vecCol, idCol,
      topK(queryVec, rerankK, nprobe), queryVec, k)
  }

  /** Durable layout: codes `partitionBy(__cell)` + a parameter sidecar.
    * The float column is NOT written — the durable form is the
    * compressed one; keep the source table for re-rank tiers. */
  def save(path: String): Unit = {
    encoded.drop(vecCol).write.mode("overwrite")
      .partitionBy("__cell").parquet(s"$path/cells")
    val spark = encoded.sparkSession
    import spark.implicits._
    Seq((nlist, cb.m, cb.k, cb.subDim, cb.flat.toSeq, cells.flatten.toSeq,
        vecCol, idCol))
      .toDF("nlist", "m", "k", "sub_dim", "codebook", "cell_centroids",
        "vec_col", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def materialize(): this.type = { encoded.count(); this }
}
