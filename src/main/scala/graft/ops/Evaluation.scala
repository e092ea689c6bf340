package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Quality metrics for approximate operators — how good is the sketch /
 * index against exact ground truth. Used to tune LSH planes, IVF nprobe,
 * and MinHash banding before paying for a 100 TB run.
 */
object Evaluation {

  /** recall@k of an approximate id set vs the exact top-k (driver-side,
    * for single-query evaluation). */
  def recallAtK[K](exact: Seq[K], approx: Seq[K]): Double =
    if (exact.isEmpty) 1.0
    else exact.toSet.intersect(approx.toSet).size.toDouble / exact.size

  /** Pair-level precision/recall of candidate pairs vs ground-truth pairs
    * (for dedup sketches). Both DataFrames need (id_a, id_b) columns, in
    * the SAME canonical orientation on both sides (the dedup ops emit
    * id_a < id_b) — a (b,a) candidate for a (a,b) truth row counts as a
    * miss, by design: orientation is part of the pair key. */
  def pairMetrics(truth: DataFrame, candidates: DataFrame): (Double, Double) = {
    val t = truth.select("id_a", "id_b").distinct()
    val c = candidates.select("id_a", "id_b").distinct()
    val tp = c.join(t, Seq("id_a", "id_b"), "left_semi").count().toDouble
    val nT = t.count().toDouble
    val nC = c.count().toDouble
    val precision = if (nC == 0) 1.0 else tp / nC
    val recall = if (nT == 0) 1.0 else tp / nT
    (precision, recall)
  }

  /** The ONE (signature, e7-integer embedding) derivation all three LSH
    * evaluation entry points share. The determinism contract ("call the
    * reports with the SAME dim/numPlanes/seed/scale as the query set")
    * holds precisely because this projection has a single definition —
    * do not inline copies of it. */
  private def sigAndE7(
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      seed: Long,
      scale: Long): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val planes = VectorSearch.randomPlanes(numPlanes, dim, seed)
    val sig = VectorSearch.hyperplaneSignature(col(vecCol), planes)
    val e7 = graft.functions.ColumnMath.scaledLongs(col(vecCol), scale)
    (sig, e7)
  }

  /** Corpus-side projection (__cid, __ce, __csig) used by both reports. */
  private def corpusProjection(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      numPlanes: Int,
      seed: Long,
      scale: Long): DataFrame = {
    val (sig, e7) = sigAndE7(vecCol, dim, numPlanes, seed, scale)
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__cid"), e7.as("__ce"), sig.as("__csig"))
  }

  /**
   * Derives the bounded LSH evaluation query set ONCE: the `numQueries`
   * smallest-id vectors with their e7-integer embedding and hyperplane
   * signature, computed by a single bounded top-k corpus pass
   * (TakeOrderedAndProject), COLLECTED (numQueries rows — a k-row
   * driver collect, not data-sized) and rebuilt as a local relation.
   * Downstream reports broadcast the local relation for free instead of
   * each paying their own corpus scan to re-derive it — share one query
   * set across [[lshRecallReport]] and [[lshMrrReport]] (they must be
   * called with the SAME dim/numPlanes/seed/scale used here).
   *
   * Output columns: (query_id, __qe: array&lt;long&gt;, __qsig: long).
   */
  def lshQuerySet(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      numQueries: Int,
      numPlanes: Int = 12,
      seed: Long = 42L,
      scale: Long = 10000000L): DataFrame = {
    require(numQueries >= 1, "numQueries >= 1")
    val (sig, e7) = sigAndE7(vecCol, dim, numPlanes, seed, scale)
    val derived = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), e7.as("__qe"), sig.as("__qsig"))
      .orderBy(col("query_id")).limit(numQueries)
    val rows = derived.collect()
    emb.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), derived.schema)
  }

  /**
   * Distributed, oracle-gatable LSH recall report: for each of the first
   * `numQueries` vectors (the `numQueries` SMALLEST ids, selected by a
   * bounded top-k on id ascending — any id domain works, dense 0-based
   * ids are not assumed), recall@k of hyperplane-LSH retrieval
   * (signature hamming ≤ `maxHamming`, then exact re-rank) against
   * brute-force ground truth — the "is this index good enough to serve"
   * number, computed as ONE Spark job instead of a driver loop.
   *
   * Determinism: both rankings use the exact integer e7 dot
   * ([[graft.functions.DenseVec.dense_dot]]) with (sim DESC, id ASC)
   * ties — no float ordering anywhere past the (spec-green) signature
   * signs — and recall is the integer `hits·1e6 quot k`, so the whole
   * report replays exactly in SQL.
   *
   * Scale shape: the query set broadcasts (numQueries rows — pass a
   * [[lshQuerySet]] local relation to avoid re-deriving it with a
   * corpus pass); the corpus is scanned TWICE (ground truth +
   * candidates), each pass reducing map-side through the bounded-heap
   * aggregate to partitions × queries × k rows; hits and totals meet in
   * ONE left join over the k-bounded exact set (the exact plan is
   * referenced once, so the corpus is not re-scanned for totals). This
   * is the measured-recall evaluation harness over a SAMPLED query
   * set — the serving path stays the bucketed index probes.
   *
   * Precondition: `idCol` must be UNIQUE in `emb`. Both rankings key on
   * it, and the hits/totals join counts (query_id, id) matches — a
   * duplicated corpus id would inflate n_exact and hits multiplicatively
   * in the join instead of failing loudly. (Every caller in this repo
   * feeds primary-key ids; dedup the corpus first if yours are not.)
   *
   * Output: (query_id, n_exact, hits, recall_e6) ordered by query_id.
   */
  def lshRecallReport(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      numQueries: Int,
      k: Int,
      numPlanes: Int = 12,
      maxHamming: Int = 3,
      seed: Long = 42L,
      scale: Long = 10000000L,
      precomputedQueries: Option[DataFrame] = None): DataFrame = {
    require(numQueries >= 1 && k >= 1, "need numQueries >= 1 and k >= 1")
    val corpus = corpusProjection(emb, vecCol, idCol, dim, numPlanes, seed, scale)
    val queries = broadcast(precomputedQueries.getOrElse(
      lshQuerySet(emb, vecCol, idCol, dim, numQueries, numPlanes, seed,
        scale)))
    val payload = struct(col("__sim"), col("__cid"))
    def topkOf(scoredCandidates: DataFrame): DataFrame = scoredCandidates
      .withColumn("__sim",
        graft.functions.DenseVec.dense_dot(col("__qe"), col("__ce")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate.topk_rows(payload, k).as("__t"))
      .select(col("query_id"), explode(col("__t")).as("__e"))
      .select(col("query_id"), col("__e.__cid").as("__cid"))
    // SELF-MATCH EXCLUDED from both rankings: for a normalized corpus
    // the query row is its own exact top-1 AND always survives the
    // hamming filter (distance 0), so self-inclusive recall was
    // inflated by a guaranteed 1/k per query — the metric should grade
    // retrieval of real neighbors, not the query finding itself.
    val pairs = corpus.crossJoin(queries)
      .filter(col("__cid") =!= col("query_id"))
    val exact = topkOf(pairs)
    val approx = topkOf(pairs.filter(
      graft.functions.HashFunctions.hamming64(col("__csig"), col("__qsig"))
        <= lit(maxHamming)))
    // one reference to `exact`: hits and totals from the same left join
    // (a second `exact.groupBy` would replay the whole ground-truth scan)
    exact.join(approx.withColumn("__hit", lit(1L)),
        Seq("query_id", "__cid"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("n_exact"), col("hits"),
        expr("hits * 1000000 DIV n_exact").as("recall_e6"))
      .orderBy("query_id")
  }

  /**
   * Distributed MRR report for LSH retrieval: per query, the rank of
   * the TRUE nearest neighbor (exact e7-integer top-1, ties id-asc)
   * inside the LSH-candidate ranking, and its reciprocal rank as the
   * integer `1e6 quot rank` (0 when the filter lost it) — the
   * first-relevant-result metric that recall@k hides. Rank is computed
   * WITHOUT materializing an ordered list: it is 1 + the count of
   * candidates strictly better under (sim DESC, id ASC) — one
   * aggregate per query, exact integers end-to-end, SQL-replayable.
   * The self-match is EXCLUDED from ground truth and candidates (it
   * made the metric vacuously perfect on normalized corpora); a query
   * whose non-self candidate set is empty reports found=0/rr=0.
   * Query selection and scan envelope match
   * [[lshRecallReport]] (bounded top-`numQueries` by id ascending).
   *
   * Output: (query_id, found, rank, rr_e6) ordered by query_id.
   */
  def lshMrrReport(
      emb: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      numQueries: Int,
      numPlanes: Int = 12,
      maxHamming: Int = 3,
      seed: Long = 42L,
      scale: Long = 10000000L,
      precomputedQueries: Option[DataFrame] = None): DataFrame = {
    require(numQueries >= 1, "numQueries >= 1")
    val corpus = corpusProjection(emb, vecCol, idCol, dim, numPlanes, seed, scale)
    // same bounded-top-k query selection as lshRecallReport; a
    // lshQuerySet local relation skips the derivation pass entirely
    val queries = broadcast(precomputedQueries.getOrElse(
      lshQuerySet(emb, vecCol, idCol, dim, numQueries, numPlanes, seed,
        scale)))
    // SELF-MATCH EXCLUDED (see lshRecallReport): with self included,
    // the true top-1 of a normalized corpus was the query itself and
    // self always survives the hamming filter, so every query scored
    // rank 1 / rr 1e6 — the report could never detect a bad index and
    // the rr=0 branch was unreachable.
    val scoredAll = corpus.crossJoin(queries)
      .filter(col("__cid") =!= col("query_id"))
      .withColumn("__sim",
        graft.functions.DenseVec.dense_dot(col("__qe"), col("__ce")))
    // min over (−sim, id): negate the SCORE (always numeric), not the
    // id — −col(id) on a string id column implicit-casts to double and
    // nulls out, which would zero every reciprocal rank silently; this
    // form keeps the (sim desc, id asc) argmax for any id domain, the
    // envelope lshRecallReport documents
    val top1 = scoredAll.groupBy(col("query_id"))
      .agg(min(struct((-col("__sim")).as("__ns"), col("__cid").as("__c"))).as("__m"))
      .select(col("query_id"), (-col("__m.__ns")).as("__s1"),
        col("__m.__c").as("__c1"))
    val cands = scoredAll.filter(
      graft.functions.HashFunctions.hamming64(col("__csig"), col("__qsig"))
        <= lit(maxHamming))
    val perQuery = cands.join(broadcast(top1), Seq("query_id"))
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("__sim") > col("__s1") ||
            (col("__sim") === col("__s1") && col("__cid") < col("__c1")),
          1L).otherwise(0L)).as("__better"),
        max(when(col("__cid") === col("__c1"), 1L).otherwise(0L))
          .as("found"))
    // LEFT join from the query set: without self-candidacy a query's
    // candidate set can be EMPTY (the filter lost everything), and the
    // join-then-group above would silently drop its row instead of
    // reporting found=0 / rr=0
    top1.select(col("query_id"))
      .join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("found"), lit(0L)).as("found"),
        when(col("found") === 1L, col("__better") + 1L).otherwise(0L)
          .as("rank"),
        when(col("found") === 1L,
          expr("1000000 DIV (__better + 1)")).otherwise(0L).as("rr_e6"))
      .orderBy("query_id")
  }

  /** The IVF-PQ ADC quality probe shared by IvfPqSpec (45% structural
    * floor) and Bench's per-round `ann_recall_adc` artifact metric —
    * ONE definition so the spec floor and the committed artifact number
    * always grade the same quantity (a Bench-side copy would silently
    * diverge the first time the spec probe is retuned): a fresh IVF-PQ
    * index (nlist=4, m=16, k=16, sampleSize=500) over `emb`
    * (columns vec_id, embedding), mean ADC recall@20 across queries
    * vec_id 0..7 against exact f64 brute-force ground truth.
    *
    * SELF-EXCLUDED (r13): the queries are drawn from the corpus, and a
    * probe that counts the query finding ITSELF grades "returns the
    * query row" as partial quality — the exact defect class the r12
    * lsh{Recall,Mrr}Report fix evicted. Both sides fetch top-(k+1) in
    * rank order, drop the query id, and keep 20 — the top-20 of the
    * corpus-minus-self by construction. The metric steps down by up to
    * 1/20 per query vs the r12 definition (baseline re-seeded in the
    * same commit).
    *
    * COST NOTE (r14, ADVICE r13): delegates to [[ivfPqRecallProbes]],
    * so an ADC-only caller also pays the 8 `topKRerank` queries
    * (rerankK=100 exact scoring) whose result is discarded. The wrapper
    * survives only as the stable name the spec floors grew up on — new
    * callers should use the pair probe directly. */
  @deprecated("use ivfPqRecallProbes — this pays the full pair probe " +
    "and discards the rerank half", "r14")
  def ivfPqAdcRecallProbe(emb: DataFrame): Double = ivfPqRecallProbes(emb)._1

  /** Both IVF-PQ quality numbers from ONE index build: (ADC recall@20,
    * exact-re-rank recall@20). The ADC number grades the compressed
    * first pass alone (what a pure code-column scan returns); the
    * re-rank number grades the PRODUCTION configuration —
    * [[IvfPqIndex.topKRerank]] with a 5× shortlist (rerankK=100), i.e.
    * ADC selects 100 candidates and exact f64 scoring of just those
    * rows picks the final 20. The two together separate "how much the
    * 64-bit codes lose" from "how much of that loss the candidate
    * shortlist recovers", which is the number a user of the re-rank
    * tier actually experiences.
    *
    * Invariant (spec-pinned): rerank >= adc per query. Both measure
    * |top20 ∩ exact20| and both top-20s are 20-subsets of the rerank
    * SHORTLIST (ADC's own top-20 trivially so); any exact-top-20 member
    * present in the shortlist outscores every non-member there (a
    * shortlist row beating an exact-top-20 member would itself be in
    * exact top-20), so exact re-ranking keeps ALL of them — the maximal
    * intersection any 20-subset of that shortlist can have.
    *
    * Self-exclusion matches [[ivfPqAdcRecallProbe]]'s r13 convention on
    * all three sides: fetch top-21 in rank order, drop the query id,
    * keep 20. */
  def ivfPqRecallProbes(emb: DataFrame): (Double, Double) =
    ivfPqRecallSweep(emb, Seq(4))(4)

  /** The same probe swept over several `nprobe` points from ONE index
    * build and ONE exact ground truth per query (r14, VERDICT item 6):
    * a probe-pruning regression — cells mis-assigned, probe order
    * broken — shows up at nprobe < nlist long before the
    * all-cells-probed point moves. Bench emits the (1, 2, 4) curve per
    * round as `ann_recall_{adc,rerank}_np{n}`; the nprobe=4 pair keeps
    * its original `ann_recall_{adc,rerank}` keys. Returns
    * nprobe → (ADC recall@20, re-rank recall@20); the rerank ≥ adc
    * invariant (Scaladoc above) holds PER POINT — both top-20s are
    * subsets of that point's OWN shortlist. Across points recall is
    * NOT monotone in theory for ADC alone, but more probed cells can
    * only grow the candidate set, so in practice the curve rises;
    * only the per-point invariant is pinned. */
  def ivfPqRecallSweep(
      emb: DataFrame,
      nprobes: Seq[Int]): Map[Int, (Double, Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(nprobes.nonEmpty, "need at least one nprobe point")
    val idx = IvfPq.build(emb, "embedding", "vec_id", nlist = 4, m = 16,
      k = 16, sampleSize = 500)
    val adcHits = scala.collection.mutable.Map(
      nprobes.map(_ -> 0): _*)
    val rerankHits = scala.collection.mutable.Map(
      nprobes.map(_ -> 0): _*)
    (0 until 8).foreach { q =>
      val qv = emb.filter(col("vec_id") === q).select("embedding")
        .head().getSeq[Float](0).toArray
      val exact = VectorSearch.topK(emb, "embedding", qv, 21, "vec_id",
        precision = "f64").select("vec_id").as[Long].collect()
        .filter(_ != q.toLong).take(20).toSet
      nprobes.foreach { np =>
        val adc = idx.topK(qv, k = 21, nprobe = np)
          .select("vec_id").as[Long].collect()
          .filter(_ != q.toLong).take(20).toSet
        val rerank = idx.topKRerank(qv, k = 21, nprobe = np, rerankK = 100)
          .select("vec_id").as[Long].collect()
          .filter(_ != q.toLong).take(20).toSet
        adcHits(np) += (adc intersect exact).size
        rerankHits(np) += (rerank intersect exact).size
      }
    }
    nprobes.map(np =>
      np -> (adcHits(np) / 160.0, rerankHits(np) / 160.0)).toMap
  }

  /** Mean recall@k of an ANN method over a batch of query rows, against
    * brute-force ground truth via knnJoin. `exact`/`approx` both carry
    * (query_id, vec_id) rows ranked within each query_id; rows must be
    * UNIQUE per (query_id, vec_id) — a duplicated approx row would count
    * twice against the exact total and report recall > 1 (the knnJoin /
    * index probes feeding this all emit unique pairs). */
  def meanRecallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val totals = exact.groupBy("query_id").agg(count(lit(1)).as("total"))
    val per = totals.join(hits, Seq("query_id"), "left")
      .select((coalesce(col("hits"), lit(0L)).cast("double") / col("total")).as("r"))
    val row = per.agg(avg(col("r"))).head()
    // avg over zero rows is NULL — surface "the ground truth was empty"
    // instead of an opaque NPE from getDouble
    require(!row.isNullAt(0),
      "meanRecallAtK: ground-truth frame has no queries")
    row.getDouble(0)
  }
}
