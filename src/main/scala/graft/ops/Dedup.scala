package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.{hamming64, minhash_signature, simhash64}
import graft.functions.VectorFunctions.cosine_sim

/**
 * Deduplication for training-data pipelines, all expressed as declarative
 * Spark plans.
 *
 * Scale notes (the whole point of each variant):
 *  - exact: one hash-aggregate on a digest — a single shuffle of (digest,
 *    id), never the full text.
 *  - minhash LSH: signatures are a map-only per-row kernel; the only
 *    shuffle is the band-bucket self-join, whose size is governed by
 *    collision probability, not corpus².
 *  - simhash: map-only signature; candidate generation by banded equality
 *    on signature chunks (4×16-bit tables ⇒ catches Hamming≤3 dups).
 *  - wordJaccardPairs: EXACT pairwise Jaccard via token inverted index —
 *    O(Σ df(token)²); the oracle/ground-truth for the sketch variants,
 *    not the 100 TB path.
 *  - embeddingNearDup: brute pair scan at small n, LSH-prefiltered at scale.
 */
object Dedup {

  /** Whitespace tokens, lowercased — tokenization shared by all dup ops. */
  def tokens(textCol: Column): Column = split(lower(textCol), " ")

  /** Word w-shingles (n-grams joined by space) — classic MinHash input. */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact dedup: group identical content by md5 digest; keeps the minimum
    * id per group (deterministic winner). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Rows surviving exact dedup (the canonical "drop duplicates, keep
    * first-by-id" shape). */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df.groupBy(col(textCol).as("__t")).agg(min(col(idCol)).as(idCol))
    df.join(keep.select(idCol), Seq(idCol), "left_semi")
  }

  /**
   * MinHash + LSH candidate pairs. Signature: `numHashes` minima per row
   * (map-only). Banding: `bands` bands of numHashes/bands values; docs
   * agreeing on ANY band land in the same bucket. Bucket self-join emits
   * candidate pairs; `withJaccard` re-ranks them with the exact token-set
   * Jaccard (cheap: only candidates, not corpus²).
   */
  def minhashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // Materialize signatures once: the bucket self-join would otherwise
    // recompute the shingle+minhash scan for BOTH sides (a full corpus
    // re-read at scale). Signatures are tiny (numHashes × 8 B per doc).
    // Shingling happens INSIDE the kernel over the token array — no
    // shingle-string construction.
    val sig = df.select(
      col(idCol).as("doc"),
      minhash_signature(tokens(col(textCol)), numHashes, shingleSize).as("sig"))
      .localCheckpoint(true)
    val banded = sig.select(
      col("doc"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
  }

  /** MinHash LSH candidates verified by exact shingle-set Jaccard ≥
    * threshold. ONE corpus pass computes signatures AND distinct shingle
    * sets into the same checkpoint; banding and both sides of the
    * verification join read from it — the corpus text is never re-scanned
    * and shingles are never recomputed. */
  def minhashDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // shingle sets carried as SORTED HASH arrays (shingle_hashes) — no
    // shingle-string allocation (that pass measured ~10× the signature
    // kernel); Jaccard on candidates is then a linear merge.
    val sig = df.select(
      col(idCol).as("doc"),
      minhash_signature(tokens(col(textCol)), numHashes, shingleSize).as("sig"),
      graft.functions.HashFunctions.shingle_hashes(
        tokens(col(textCol)), shingleSize).as("__toks"))
      .localCheckpoint(true)
    val banded = sig.select(
      col("doc"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    val toks = sig.select(col("doc"), col("__toks"))
    cand
      .join(toks.select(col("doc").as("id_a"), col("__toks").as("__ta")), Seq("id_a"))
      .join(toks.select(col("doc").as("id_b"), col("__toks").as("__tb")), Seq("id_b"))
      .withColumn("jaccard",
        graft.functions.HashFunctions.jaccard_sorted(col("__ta"), col("__tb")))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup candidate pairs within `maxHamming` bits, via 4-way
    * 16-bit banding (any equal quarter ⇒ candidate; guarantees recall for
    * Hamming ≤ 3 when maxHamming ≥ 3). */
  def simhashDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("doc"), simhash64(tokens(col(textCol))).as("sig"))
      .localCheckpoint(true) // one signature pass, not one per join side
    val banded = sig.select(col("doc"), col("sig"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("sig"), q * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.sig").as("__sa"), col("b.sig").as("__sb"))
      .distinct()
      .withColumn("hamming", hamming64(col("__sa"), col("__sb")))
      .filter(col("hamming") <= lit(maxHamming))
      .select("id_a", "id_b", "hamming")
  }

  /**
   * EXACT pairwise word-set Jaccard ≥ threshold via token inverted index:
   * explode distinct tokens, self-join on token, count intersections,
   * derive |A∪B| = |A|+|B|−|A∩B|. Ground truth for the sketches; cost is
   * Σ df(token)² — use the MinHash path when that explodes.
   */
  def wordJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val t = df.select(col(idCol).as("doc"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val sizes = t.groupBy("doc").agg(count(lit(1)).as("n"))
    val pairs = t.alias("a").join(t.alias("b"),
        col("a.tok") === col("b.tok") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast("double") /
      (col("na") + col("nb") - col("inter")).cast("double")
    pairs
      .join(sizes.select(col("doc").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(j >= lit(threshold))
      .select(col("id_a"), col("id_b"), round(j, 4).as("jaccard"))
  }

  /**
   * Test-set contamination: for each document in `test`, the fraction of
   * its distinct word n-grams that also occur ANYWHERE in `train` — the
   * standard decontamination signal (drop or flag test docs with high
   * overlap before evaluation, or train docs that leak benchmarks).
   *
   * Scale shape: n-grams travel as 64-bit hashes (shingle_hashes — no
   * n-gram strings materialized); the train side is one distinct of
   * hashes; the test side joins against it on the hash — two shuffles
   * total, both on 8-byte keys, never on text.
   */
  def ngramContamination(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8): DataFrame = {
    import graft.functions.HashFunctions.shingle_hashes
    val trainGrams = train
      .select(explode(shingle_hashes(tokens(col(textCol)), n)).as("g"))
      .distinct()
    val testGrams = test.select(col(idCol).as("test_id"),
        explode(shingle_hashes(tokens(col(textCol)), n)).as("g"))
    val totals = testGrams.groupBy("test_id").agg(count(lit(1)).as("n_grams"))
    val hits = testGrams.join(trainGrams, Seq("g"), "left_semi")
      .groupBy("test_id").agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("test_id"), "left")
      .select(col("test_id"), col("n_grams"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_grams"), 4).as("contamination"))
  }

  /**
   * Connected components over a candidate-pair graph: groups mutual
   * near-duplicates into clusters (a ~ b, b ~ c ⇒ {a, b, c}) so
   * survivorship can keep ONE document per cluster rather than
   * re-comparing pairs. Iterative min-label propagation expressed in
   * DataFrames: each round every vertex takes the minimum label among
   * itself and its neighbors; rounds until fixpoint (≤ component
   * diameter, typically ≤ 5 for dedup clusters). Each round is one
   * shuffle on the EDGE list — the corpus itself is never touched, and
   * the edge list is collision-bounded (the candidates), not corpus².
   * State is localCheckpointed per round so lineage stays flat.
   */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIterations: Int = 50): DataFrame = {
    val fwd = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .distinct().withColumn("component", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIterations) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("__nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nmin"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("component", "__old"), Seq("id"))
        .filter(col("component") =!= col("__old")).count()
      labels = next
      it += 1
    }
    labels
  }

  /**
   * Survivorship: one winner per duplicate cluster. Rows never named in
   * `pairs` survive untouched; within each component the row with the
   * highest `scoreCol` (ties → smallest id) survives. Returns the
   * surviving rows of `df`.
   */
  def survivors(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      scoreCol: Column): DataFrame = {
    val comp = connectedComponents(pairs)
    val scored = df.withColumn("__score", scoreCol)
    val member = scored.join(comp.withColumnRenamed("id", idCol), Seq(idCol))
    // argmax per component via the bounded-heap aggregate at k = 1:
    // ranks (score DESC, id ASC) — deterministic, map-side pre-reduced
    val winners = member
      .groupBy(col("component"))
      .agg(graft.functions.TopKAggregate.topk_rows(
        struct(col("__score"), col(idCol)), 1).as("__w"))
      .select(explode(col("__w")).as("__e"))
      .select(col("__e").getField(idCol).as(idCol))
    val nonMembers = scored.join(comp.withColumnRenamed("id", idCol),
      Seq(idCol), "left_anti")
    nonMembers.drop("__score")
      .unionByName(scored.join(winners, Seq(idCol), "left_semi").drop("__score"))
  }

  /** Embedding-cosine near-dup pairs — EXACT brute pairwise; ground truth
    * and fine at modest n. The 100 TB path is the LSH variant below. */
  def embeddingNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine_sim(col("__va"), col("__vb")))
      .filter(col("cos") >= lit(threshold))
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /**
   * LSH-bucketed embedding near-dup pairs — the scale path: random-
   * hyperplane signatures (map-only), banded bucket self-join (the only
   * shuffle; candidate volume governed by collision probability), exact
   * cosine verification on candidates only.
   *
   * Probability note: per-bit agreement is 1 − θ/π, so banding prunes
   * well for HIGH thresholds (true near-dups, cos ≥ ~0.8). For loose
   * thresholds the geometry gives little separation — use the exact
   * variant or raise `bands`/lower `rowsPerBand` and pay more candidates.
   */
  def embeddingNearDupPairsLSH(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      dim: Int,
      numPlanes: Int = 32,
      bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    require(numPlanes <= 64 && numPlanes % bands == 0,
      "numPlanes must be <= 64 and divisible by bands")
    require(dim > 0, "dim must be the embedding dimensionality (> 0)")
    val rows = numPlanes / bands
    val mask = if (rows == 64) -1L else (1L << rows) - 1
    val planes = VectorSearch.randomPlanes(numPlanes, dim, seed)
    val sig = df.select(col(idCol).as("doc"), col(vecCol).as("__v"),
        VectorSearch.hyperplaneSignature(col(vecCol), planes).as("__sig"))
      .localCheckpoint(true) // one signature pass, not one per join side
    // Candidates travel as ID PAIRS only: the banded self-join and its
    // distinct never shuffle embedding payloads (6 KB/row at d=1536 —
    // the dominant exchange cost at scale); vectors re-attach from the
    // checkpoint for the exact-cosine verification of candidates only.
    val banded = sig.select(col("doc"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("__sig"), b * rows).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    val vecs = sig.select(col("doc"), col("__v"))
    cand
      .join(vecs.select(col("doc").as("id_a"), col("__v").as("__va")), Seq("id_a"))
      .join(vecs.select(col("doc").as("id_b"), col("__v").as("__vb")), Seq("id_b"))
      .withColumn("cos", cosine_sim(col("__va"), col("__vb")))
      .filter(col("cos") >= lit(threshold))
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
