package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.embed.EmbeddingFunc
import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.{dot_const_f32, is_normalized, normalize_f32}

/**
 * A collection of documents — parity with reference collection.go:16-29,
 * re-expressed Spark-first.
 *
 * State is one immutable DataFrame with `Document.schema`, swapped
 * atomically on mutation. Immutability gives the reader/writer safety the
 * reference gets from its RWMutex (collection.go:21) with zero locking on
 * the read path. A driver-side row count is maintained with the state so
 * the `nResults <= count` check (collection.go:505-507) costs no Spark job.
 *
 * Scale notes (100 TB design):
 *  - The query path is filter → scalar dot-product projection →
 *    `ORDER BY sim DESC LIMIT k`. Catalyst plans the latter as
 *    TakeOrderedAndProject: per-partition bounded heap + driver merge —
 *    exactly the reference's per-goroutine-heap algorithm (query.go:16-83)
 *    but distributed, with NO full shuffle and NO full sort.
 *  - The query vector travels as a literal (few KB) — no broadcast join.
 *  - Filters are pushed to the parquet scan; the expensive dot product
 *    only runs on filter survivors (reference orders it the same way,
 *    collection.go:521 before :542).
 */
class Collection private[core] (
    val name: String,
    collMetadata: Map[String, String],
    initialEmbedFunc: EmbeddingFunc,
    private val spark: SparkSession,
    initial: Option[DataFrame],
    persist: Option[CollectionPersistence]) {

  // Mutable like the reference's collection.embed (db.go:552-558
  // re-attaches on the SAME object): handing out a re-attached COPY
  // would fork the collection — earlier handles and the registry entry
  // would then mutate independent states over one parquet dir.
  @volatile private var embedFuncRef: EmbeddingFunc = initialEmbedFunc
  def embedFunc: EmbeddingFunc = embedFuncRef
  private[core] def setEmbeddingFunc(ef: EmbeddingFunc): Unit = { embedFuncRef = ef }

  // DB.deleteCollection / createCollection-overwrite detach the old
  // handle's persistence so a stale handle's later mutation can never
  // recreate the deleted directory on disk (sidecar-less resurrection
  // on the next DB.persistent reload). The stale mutation itself fails
  // loudly anyway — its upsert plan reads the deleted parquet — which
  // is the intended outcome: an error, not silent resurrection.
  @volatile private var persistRef: Option[CollectionPersistence] = persist
  private[core] def detachPersistence(): Unit = { persistRef = None }

  import spark.implicits._

  /** One immutable view of the collection: rows + count + the optional
    * indexes built OVER those rows, swapped together through a single
    * volatile (replaces documentsLock RWMutex, collection.go:21). Readers
    * take ONE `snap` read and get a coherent (state, index) pair — with
    * the previous four independent volatiles, a query could read the OLD
    * flat index and then join back against the NEW state, silently
    * returning deleted ids' holes / stale scores. Writers are all
    * `synchronized`, so copy-and-swap inside a writer is race-free;
    * displaced indexes unpersist AFTER the swap so no new reader can pick
    * them up. */
  private final class Snap(
      val df0: DataFrame,
      n0: => Long,
      val flat: Option[graft.ops.VectorIndex[String]],
      val lsh: Option[graft.ops.LshIndex],
      val ivf: Option[graft.ops.IvfState]) {
    // plain class (not a case class: the synthetic inner-class equals
    // emits an uncheckable outer-reference type test); identity
    // semantics are what `snap eq before` wants anyway
    /** Row count of df0. LAZY so the OPEN-time snap defers its count —
      * DB.persistent used to run one Spark count job per catalog entry
      * before returning (linear-in-collections startup); the first
      * count()/ingest that needs the number forces it once. Mutation
      * commits still pass a precomputed value (their eager post-swap
      * count is what readCommitted's monitor-bounce timing relies on),
      * so a forced lazy count only ever races a commit on the OPEN
      * snap — count() wraps in readCommitted for exactly that window.
      * A lazy val whose initializer throws stays uninitialized, so a
      * lost-file failure does not poison the snap for the retry. */
    lazy val n: Long = n0
    def copy(
        flat: Option[graft.ops.VectorIndex[String]] = this.flat,
        lsh: Option[graft.ops.LshIndex] = this.lsh,
        ivf: Option[graft.ops.IvfState] = this.ivf): Snap =
      new Snap(df0, n, flat, lsh, ivf)
  }

  @volatile private var snap: Snap = {
    val df = initial.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Document.schema))
    // the count defers via Snap's by-name n (no job when never asked);
    // getOrElse(0L) keeps fresh in-memory collections job-free forever
    new Snap(df, initial.map(_.count()).getOrElse(0L), None, None, None)
  }

  def metadata: Map[String, String] = collMetadata

  /** Current collection contents as a DataFrame. In-memory collections
    * return a checkpointed snapshot — immutable under later mutations.
    * PERSISTENT collections return a live view over the collection's
    * parquet files BY DESIGN (pinning a 100 TB corpus into executor
    * blocks per mutation would defeat the persistent tier): the next
    * mutation replaces those files, after which frames returned EARLIER
    * fail on access (Spark's "underlying files have been updated").
    * Callers needing a mutation-stable snapshot of a persistent
    * collection should `.localCheckpoint()` the returned frame, or keep
    * real versions via [[graft.persist.SnapshotStore]]. */
  def df: DataFrame = snap.df0

  /** Row count — reference collection.go:391-395, served from driver
    * state (O(1) after the snap's count is known). An OPEN-time snap
    * defers its count to the first call, which scans live parquet and
    * can therefore lose its file view to a concurrent commit — same
    * read-committed contract (and retry) as every other collecting
    * read. */
  def count(): Long = readCommitted(snap.n)

  // ------------------------------------------------------------------
  // Ingest (reference collection.go:131-293)
  // ------------------------------------------------------------------

  /** Chroma-style columnar add — reference collection.go:131-133. */
  def add(
      ids: Seq[String],
      embeddings: Seq[Array[Float]] = null,
      metadatas: Seq[Map[String, String]] = null,
      contents: Seq[String] = null): Unit =
    addConcurrently(ids, embeddings, metadatas, contents, concurrency = 1)

  /** Columnar add with validation — reference collection.go:140-187.
    * `concurrency` maps to ingest partition count. */
  def addConcurrently(
      ids: Seq[String],
      embeddings: Seq[Array[Float]] = null,
      metadatas: Seq[Map[String, String]] = null,
      contents: Seq[String] = null,
      concurrency: Int = 1): Unit = {
    if (ids == null || ids.isEmpty)
      throw new IllegalArgumentException("ids are empty")
    if ((embeddings == null || embeddings.isEmpty) && (contents == null || contents.isEmpty))
      throw new IllegalArgumentException("either embeddings or contents must be filled")
    if (embeddings != null && embeddings.nonEmpty && embeddings.length != ids.length)
      throw new IllegalArgumentException("ids and embeddings must have the same length")
    if (metadatas != null && metadatas.nonEmpty && metadatas.length != ids.length)
      throw new IllegalArgumentException(
        "when metadatas is not empty it must have the same length as ids")
    if (contents != null && contents.nonEmpty && contents.length != ids.length)
      throw new IllegalArgumentException("ids and contents must have the same length")
    if (concurrency < 1)
      throw new IllegalArgumentException("concurrency must be at least 1")
    val docs = ids.indices.map { i =>
      Document(
        id = ids(i),
        metadata = if (metadatas == null || metadatas.isEmpty) Map.empty else metadatas(i),
        embedding = if (embeddings == null || embeddings.isEmpty) null else embeddings(i),
        content = if (contents == null || contents.isEmpty) null else contents(i))
    }
    addDocuments(docs, concurrency)
  }

  /** Batch upsert — reference collection.go:193-245 + AddDocument :250-293.
    * Docs without an embedding are embedded via `embedFunc` inside
    * `mapPartitions` (one task = one reference worker goroutine); vectors
    * are normalized on ingest when needed so the query path never
    * re-normalizes stored vectors (collection.go:272-276). */
  def addDocuments(documents: Seq[Document], concurrency: Int = 1): Unit = {
    if (documents == null || documents.isEmpty)
      throw new IllegalArgumentException("documents slice is nil or empty")
    if (concurrency < 1)
      throw new IllegalArgumentException("concurrency must be at least 1")
    documents.foreach(Document.validate)
    // last occurrence per id wins, decided driver-side while batch order is
    // still defined (map-assignment overwrite parity, collection.go:280)
    val lastWins = documents.zipWithIndex
      .groupBy(_._1.id).valuesIterator.map(_.maxBy(_._2)._1).toVector
    val batch = spark.createDataset(lastWins).toDF()
      .repartition(math.min(concurrency, lastWins.size))
    addDF(batch)
  }

  /**
   * Bulk upsert of a conforming DataFrame — THE scale path. Upsert-by-id
   * (map-assignment overwrite in the reference, collection.go:280) becomes:
   * within-batch last-writer-wins, then anti-join old state against batch
   * ids, then union. Both the anti-join and the dedup shuffle on `id`.
   */
  def addDF(batch: DataFrame): Unit = synchronized {
    val ef = embedFunc
    val conformed = batch.select(
      col("id").cast("string").as("id"),
      col("metadata").cast(Document.schema("metadata").dataType).as("metadata"),
      col("embedding").cast("array<float>").as("embedding"),
      col("content").cast("string").as("content"))
    // Embed missing vectors per PARTITION via embedBatch — one embedding
    // client + request batching per task, not a row-at-a-time UDF call
    // (the reference's worker-goroutine shape, collection.go:218-240,
    // mapped onto Spark tasks).
    val embedded = conformed.as[Document].mapPartitions { it =>
      it.grouped(256).flatMap { chunk => // bounded per-task buffering
        // id validation HERE, not just in addDocuments (reference
        // NewDocument, collection.go:257-259): addDF is the scale entry
        // point, and a null/empty-id row that carries its own embedding
        // would otherwise skip every other guard and enter state as an
        // unaddressable id
        chunk.foreach { d =>
          if (d.id == null || d.id.isEmpty)
            throw new IllegalArgumentException("document id is empty")
        }
        val (needVec, haveVec) =
          chunk.partition(d => d.embedding == null || d.embedding.isEmpty)
        needVec.foreach { d =>
          if (d.content == null || d.content.isEmpty)
            throw new IllegalArgumentException(
              "either document embedding or content must be filled")
        }
        val vecs = ef.embedBatch(needVec.iterator.map(_.content)).toSeq
        if (vecs.length != needVec.length)
          throw new IllegalStateException(
            s"embedding function returned ${vecs.length} vectors for ${needVec.length} texts")
        haveVec ++ needVec.lazyZip(vecs).map((d, v) => d.copy(embedding = v))
      }
    }.toDF()
      .withColumn("embedding",
        when(is_normalized(col("embedding")), col("embedding"))
          .otherwise(normalize_f32(col("embedding"))))
    // last occurrence per id within the batch wins (SURVEY §7.4).
    // "Last" means PARTITION order: monotonically_increasing_id ranks by
    // (partition index, position), which is deterministic for a given
    // partitioning but is NOT an arrival order — a distributed batch has
    // none. Callers that need a specific winner among same-id rows must
    // pre-dedup (addDocuments does, driver-side) or carry an explicit
    // sequence column and dedup on it before addDF.
    val deduped = embedded
      .withColumn("__seq", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__seq").desc)))
      .filter(col("__rn") === 1).drop("__seq", "__rn")
      // persist: `next` references this subtree TWICE (anti-join id side
      // and union payload side) and column pruning can't reach into the
      // embed mapPartitions — without the cache every document would be
      // EMBEDDED twice per upsert, doubling the provider API cost of
      // the single most expensive ingest stage
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val old = snap.df0
      val next = old.join(deduped.select("id"), Seq("id"), "left_anti")
        .unionByName(deduped.select(old.columns.map(col).toIndexedSeq: _*))
      commit(next)
    } finally { deduped.unpersist(); () }
  }

  /**
   * Continuous ingestion: upsert every micro-batch of a streaming
   * DataFrame (document-schema-conforming) into this collection.
   * `foreachBatch` gives the batch-side merge (embed-missing + last-wins
   * upsert) exactly-once per epoch under the checkpoint. The streaming
   * tier of the ingest family — at scale this is how a collection tails
   * a landing zone.
   */
  def addStream(
      stream: DataFrame,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) addDF(batch)
      }
      .start()

  // ------------------------------------------------------------------
  // Point lookups / maintenance (reference collection.go:296-395)
  // ------------------------------------------------------------------

  /** Point lookup — reference collection.go:311-331. */
  def getByID(id: String): Document = {
    if (id == null || id.isEmpty)
      throw new IllegalArgumentException("document ID is empty")
    readCommitted {
      df.filter(col("id") === lit(id)).as[Document].collect().headOption
        .getOrElse(throw new NoSuchElementException(s"document with ID '$id' not found"))
    }
  }

  /** All IDs — reference collection.go:296-306. API-parity convenience
    * that COLLECTS to the driver: at 100 TB (billions of ids) this OOMs —
    * use [[listIDsDF]] for anything downstream of a real corpus. */
  def listIDs(): Seq[String] = readCommitted {
    df.select("id").as[String].collect().toIndexedSeq
  }

  /** All IDs as a DataFrame — the scale-safe form of [[listIDs]]:
    * composes into joins/anti-joins without ever touching the driver. */
  def listIDsDF(): DataFrame = df.select("id")

  /** Delete by ids and/or filters — reference collection.go:338-388.
    * Spark-first: the new state is an anti-filter (no per-row file deletes). */
  def delete(
      where: Map[String, String] = Map.empty,
      whereDocument: Map[String, String] = Map.empty,
      ids: Seq[String] = Seq.empty): Unit = synchronized {
    if (where.isEmpty && whereDocument.isEmpty && ids.isEmpty)
      throw new IllegalArgumentException("must have at least one of where, whereDocument or ids")
    Filters.validateWhereDocument(whereDocument, "unsupported whereDocument operator")
    val old = snap.df0
    // Reference precedence (collection.go:359-368): when any filter map is
    // given, the filter decides the victims; ids are used only otherwise.
    val victim =
      if (where.nonEmpty || whereDocument.nonEmpty) Filters.predicate(where, whereDocument)
      else col("id").isInCollection(ids)
    commit(old.filter(!victim))
  }

  // ------------------------------------------------------------------
  // Query (reference collection.go:414-559, query.go)
  // ------------------------------------------------------------------

  /** Text query — reference collection.go:414-429. */
  def query(
      queryText: String,
      nResults: Int,
      where: Map[String, String] = Map.empty,
      whereDocument: Map[String, String] = Map.empty): Seq[QueryResult] = {
    if (queryText == null || queryText.isEmpty)
      throw new IllegalArgumentException("queryText is empty")
    queryEmbedding(embedFunc.embed(queryText), nResults, where, whereDocument)
  }

  /** Vector query — reference collection.go:484-493. */
  def queryEmbedding(
      queryEmbedding: Array[Float],
      nResults: Int,
      where: Map[String, String] = Map.empty,
      whereDocument: Map[String, String] = Map.empty): Seq[QueryResult] =
    runQuery(queryEmbedding, nResults, where, whereDocument, negVector = null, negThreshold = 0f)

  /** Options/negative query — reference collection.go:431-481. */
  def queryWithOptions(options: QueryOptions): Seq[QueryResult] = {
    val hasText = options.queryText != null && options.queryText.nonEmpty
    val hasVec = options.queryEmbedding != null && options.queryEmbedding.nonEmpty
    if (!hasText && !hasVec)
      throw new IllegalArgumentException("QueryText and QueryEmbedding options are empty")
    var qv = if (hasVec) options.queryEmbedding else embedFunc.embed(options.queryText)
    var negVec: Array[Float] = null
    var negThreshold = 0f
    val neg = options.negative
    if (neg != null && ((neg.text != null && neg.text.nonEmpty) ||
        (neg.embedding != null && neg.embedding.nonEmpty))) {
      val nvRaw =
        if (neg.embedding != null && neg.embedding.nonEmpty) neg.embedding
        else embedFunc.embed(neg.text)
      val nv = if (VectorFunctions.isNormalized(nvRaw)) nvRaw
               else VectorFunctions.normalize(nvRaw)
      neg.mode match {
        case NegativeMode.Subtract | null | "" =>
          qv = VectorFunctions.normalize(VectorFunctions.subtract(qv, nv))
        case NegativeMode.Filter =>
          negVec = nv
          negThreshold =
            if (neg.filterThreshold == 0f) NegativeMode.DefaultNegativeFilterThreshold
            else neg.filterThreshold
        case other =>
          throw new IllegalArgumentException(s"""unsupported negative mode: "$other"""")
      }
    }
    runQuery(qv, options.nResults, options.where, options.whereDocument, negVec, negThreshold)
  }

  /**
   * Build (or rebuild) the packed FLAT index for this collection's
   * embeddings. Unfiltered `queryEmbedding` calls then scan packed
   * primitive float[] slabs (~2× faster than the columnar DataFrame scan;
   * see ops.VectorIndex) and join survivors back by id — the reference's
   * own materialize-by-id step (collection.go:547-556). Any mutation
   * drops the index; call again to rebuild.
   */
  def buildIndex(numBlocks: Int = 0): Unit = synchronized {
    val s = snap
    if (s.n > 0) {
      // explicit type: the this.type chain otherwise infers an
      // inexpressible existential (a -feature warning)
      val built: graft.ops.VectorIndex[String] = graft.ops.VectorIndex
        .build[String](s.df0.filter(col("embedding").isNotNull), "id", "embedding",
          embeddingDim(s.df0), numBlocks)
        .persist().materialize()
      snap = s.copy(flat = Some(built))
      // release the DISPLACED index's persisted blocks after the swap
      // (no new reader can reach it anymore)
      s.flat.foreach(_.unpersist())
    }
  }

  def hasIndex: Boolean = snap.flat.isDefined

  /**
   * Build (or rebuild) a persisted hyperplane-LSH index: one map-only
   * signature pass over the collection, cached. Subsequent
   * `queryEmbeddingApprox` calls probe the precomputed signature column —
   * no per-query corpus signature recompute (the gap flagged against the
   * one-shot `VectorSearch.lshTopK`).
   */
  def buildLshIndex(numPlanes: Int = 16, seed: Long = 42L): Unit = synchronized {
    val s = snap
    if (s.n > 0) {
      val built = graft.ops.AnnIndex
        .buildLsh(s.df0.filter(col("embedding").isNotNull), "embedding", "id",
          dim = embeddingDim(s.df0), numPlanes = numPlanes, seed = seed)
        .materialize()
      snap = s.copy(lsh = Some(built))
      s.lsh.foreach(_.unpersist())
    }
  }

  /**
   * Build (or rebuild) a persisted IVF index: centroids trained once on a
   * bounded driver-side sample, corpus clustered by cell and cached.
   * Subsequent `queryEmbeddingApprox` calls scan only the `nprobe`
   * nearest cells of the clustered layout.
   */
  def buildIvfIndex(nlist: Int = 16, sampleSize: Int = 10000): Unit = synchronized {
    val s = snap
    if (s.n > 0) {
      val built = graft.ops.AnnIndex
        .buildIvf(s.df0.filter(col("embedding").isNotNull), "embedding", "id",
          nlist = nlist, sampleSize = sampleSize)
        .materialize()
      snap = s.copy(ivf = Some(built))
      s.ivf.foreach(_.unpersist())
    }
  }

  def hasAnnIndex: Boolean = { val s = snap; s.lsh.isDefined || s.ivf.isDefined }

  /**
   * Approximate nearest-neighbor query through a built ANN index (LSH
   * preferred, then IVF); falls back to the EXACT path when none is
   * built. Unfiltered by design — an ANN layout is an unfiltered
   * physical clustering; filtered queries take the exact path where
   * predicates prune before scoring.
   *
   * An approximate probe visits only the query's signature/cell
   * neighborhood, so it can find FEWER than `nResults` rows (e.g. a tight
   * `maxHamming` around an isolated query). When that happens this method
   * falls back to the exact path rather than silently underfilling — the
   * caller always gets min(nResults, embedded rows) results. (nResults is
   * validated against the total document count for reference error
   * parity; rows with no embedding can never be returned by either path.)
   */
  def queryEmbeddingApprox(
      queryEmbedding: Array[Float],
      nResults: Int,
      maxHamming: Int = 2,
      nprobe: Int = 2): Seq[QueryResult] = {
    if (queryEmbedding == null || queryEmbedding.isEmpty)
      throw new IllegalArgumentException("queryEmbedding is empty")
    if (nResults <= 0)
      throw new IllegalArgumentException("nResults must be > 0")
    if (nResults > count())
      throw new IllegalArgumentException(
        "nResults must be <= the number of documents in the collection")
    readCommitted {
      val s = snap // one coherent (state, index) view for the whole probe
      val probe = s.lsh.map(_.topK(queryEmbedding, nResults, maxHamming))
        .orElse(s.ivf.map(_.topK(queryEmbedding, nResults, nprobe)))
      probe match {
        case Some(p) =>
          val rows = p.as[QueryResult].collect().toIndexedSeq
          if (rows.length < nResults) this.queryEmbedding(queryEmbedding, nResults)
          else rows
        case None => this.queryEmbedding(queryEmbedding, nResults)
      }
    }
  }

  /**
   * Keyword (BM25) query over document content — the lexical retrieval
   * tier a search stack pairs with the vector query. Beyond-reference
   * (chromem-go scores cosine only); tokenization is lowercased
   * whitespace, consistent with the dedup/text operators. Returns up to
   * `nResults` documents that share ≥ 1 term with the query, ranked by
   * Okapi BM25, `similarity` = the BM25 score.
   */
  def queryKeyword(
      terms: Seq[String],
      nResults: Int,
      k1: Double = 1.2,
      b: Double = 0.75): Seq[QueryResult] = {
    if (terms == null || terms.isEmpty)
      throw new IllegalArgumentException("terms is empty")
    if (nResults <= 0)
      throw new IllegalArgumentException("nResults must be > 0")
    if (nResults > count())
      throw new IllegalArgumentException(
        "nResults must be <= the number of documents in the collection")
    readCommitted {
      val base = df // ONE state read: score and join back over the same rows
      materializeByScore(graft.ops.KeywordSearch.bm25TopK(
        base.filter(col("content").isNotNull), "content", "id", terms,
        nResults, k1, b), base)
    }
  }

  /**
   * Hybrid query: BM25 keyword top-`fetchK` fused with cosine top-`fetchK`
   * by reciprocal-rank fusion, returning the fused top-`nResults`.
   * `similarity` = the RRF score (Σ 1/(rrfK + rank) over the lists that
   * contain the document).
   */
  def queryHybrid(
      terms: Seq[String],
      queryEmbedding: Array[Float],
      nResults: Int,
      fetchK: Int = 50,
      rrfK: Int = 60): Seq[QueryResult] = {
    if (terms == null || terms.isEmpty)
      throw new IllegalArgumentException("terms is empty")
    if (queryEmbedding == null || queryEmbedding.isEmpty)
      throw new IllegalArgumentException("queryEmbedding is empty")
    if (nResults <= 0)
      throw new IllegalArgumentException("nResults must be > 0")
    if (nResults > count())
      throw new IllegalArgumentException(
        "nResults must be <= the number of documents in the collection")
    val q = if (VectorFunctions.isNormalized(queryEmbedding)) queryEmbedding
            else VectorFunctions.normalize(queryEmbedding)
    val fetch = math.max(fetchK, nResults)
    readCommitted {
      val base = df // ONE state read for lexical side, semantic side, join-back
      materializeByScore(graft.ops.KeywordSearch.hybridTopK(
        base.filter(col("content").isNotNull), "content",
        base.filter(col("embedding").isNotNull), "embedding", "id",
        terms, q, nResults, fetch, rrfK), base)
    }
  }

  /**
   * Late-interaction (ColBERT MaxSim) query: the stored embedding and
   * the query are reshaped into `numSub` contiguous sub-vectors and
   * scored Σ_i max_j ⟨q_i, d_j⟩ — token-level matching that pooling
   * averages away. Beyond-reference retrieval tier alongside
   * queryKeyword/queryHybrid; `similarity` = MaxSim score normalized
   * by numSub (mean best-part cosine, ∈ [-1, 1] for normalized parts).
   */
  def queryMaxSim(
      queryEmbedding: Array[Float],
      nResults: Int,
      numSub: Int = 8): Seq[QueryResult] = {
    if (queryEmbedding == null || queryEmbedding.isEmpty)
      throw new IllegalArgumentException("queryEmbedding is empty")
    if (nResults <= 0)
      throw new IllegalArgumentException("nResults must be > 0")
    if (nResults > count())
      throw new IllegalArgumentException(
        "nResults must be <= the number of documents in the collection")
    val q = if (VectorFunctions.isNormalized(queryEmbedding)) queryEmbedding
            else VectorFunctions.normalize(queryEmbedding)
    // maxSimTopK scores in scale² integer units (one scale per operand
    // of each sub-dot); divide by the same scale the kernel ran with so
    // the two can never drift apart, then average over the sub-vectors.
    val scale = 10000000L
    val unit = scale.toDouble * scale.toDouble * numSub
    readCommitted {
      val base = df // ONE state read: score and join back over the same rows
      val scored = graft.ops.LateInteraction.maxSimTopK(
          base.filter(col("embedding").isNotNull), "embedding", "id",
          q, numSub, nResults, scale)
        .select(col("id"),
          (col("score").cast("double") / unit).as("score"))
      materializeByScore(scored, base)
    }
  }

  /** Read-committed retry for query bodies that scan the collection.
    *
    * In-memory snapshots are localCheckpointed (immutable) — `body` runs
    * once. PERSISTENT collections scan live parquet: each committed view
    * pins its file list when commit() re-reads the directory, so a single
    * view can never silently tear across commits — but a concurrent
    * commit DELETES the displaced files, and a scan that straddles the
    * swap dies loudly (Spark FAILED_READ_FILE / FileNotFoundException /
    * "underlying files ... have been updated"). `body` must read
    * `snap`/`df` INSIDE itself: on file loss we re-run it against the
    * freshly committed snapshot — each attempt sees one coherent view. */
  private[core] def readCommitted[A](body: => A): A = {
    def fileLoss(e: Throwable): Boolean = {
      var c = e
      // depth bound: a cause CYCLE of length > 1 (A->B->A) would loop
      // forever under the simple self-reference check alone; real Spark
      // cause chains are < 10 deep
      var hops = 0
      while (c != null && hops < 20) {
        hops += 1
        if (c.isInstanceOf[java.io.FileNotFoundException]) return true
        c match {
          // typed check first: Spark raises file-loss with the
          // FAILED_READ_FILE.* error condition (SparkThrowable)
          case st: org.apache.spark.SparkThrowable
              if Option(st.getCondition).exists(_.startsWith("FAILED_READ_FILE")) =>
            return true
          case _ =>
        }
        // message backstop: cached-plan invalidation surfaces as plain
        // "underlying files ... have been updated" without the condition
        val m = c.getMessage
        if (m != null && m.contains("have been updated")) return true
        c = if (c.getCause eq c) null else c.getCause
      }
      false
    }
    val maxAttempts = 3
    var attempt = 0
    while (true) {
      attempt += 1
      val before = snap
      try return body
      catch {
        case e: Throwable if persistRef.isDefined && fileLoss(e) =>
          if (attempt >= maxAttempts)
            // sustained back-to-back commits starved the reader; say so
            // instead of surfacing a raw FileNotFoundException
            throw new java.util.ConcurrentModificationException(
              s"read-committed read lost its pinned file view $maxAttempts times " +
                "in a row under concurrent commits; last loss attached").initCause(e)
          // The displaced files die inside the concurrent commit's
          // write() swap, but the NEW snapshot lands only after its
          // post-swap re-read/count — retrying immediately would
          // re-scan the same dead view. Every writer holds THIS
          // object's monitor from before the swap until after the snap
          // assignment, so briefly taking the monitor blocks exactly
          // until the in-flight commit (however long its re-read takes)
          // has published the fresh view; if the file loss had some
          // other cause (no writer active), this is a no-op and the
          // retry fails fast instead of sleeping out a deadline.
          this.synchronized(())
          if (snap eq before) Thread.sleep(50) // commit not yet in its monitor: one short grace
      }
    }
    throw new IllegalStateException("unreachable: retry loop returns or throws")
  }

  /** Join-back materialization for (id, score) frames — the reference's
    * own re-read-by-id step (collection.go:547-556), preserving the
    * score ranking. `base` must be the SAME frame `scored` was built
    * from: re-reading the volatile state here would tear against a
    * concurrent commit (deleted docs silently dropped from the result,
    * new content attached to old scores). For persistent collections the
    * two collects here scan the same pinned file list, so they stay
    * coherent; a concurrent swap surfaces as file loss, which
    * [[readCommitted]] retries on the new snapshot. */
  private def materializeByScore(
      scored: DataFrame, base: DataFrame): Seq[QueryResult] = {
    val top = scored.collect().map(r => r.getString(0) -> r.getDouble(1)).toIndexedSeq
    if (top.isEmpty) return Seq.empty
    val scores = top.toMap
    val order = top.map(_._1).zipWithIndex.toMap
    base.filter(col("id").isInCollection(top.map(_._1)))
      .as[Document].collect()
      .map(d => QueryResult(d.id, d.metadata, d.embedding, d.content,
        scores(d.id).toFloat))
      .sortBy(r => order(r.id)).toIndexedSeq
  }

  private def embeddingDim(df0: DataFrame): Int =
    df0.select("embedding").filter(col("embedding").isNotNull)
      .head().getSeq[Float](0).length

  /** The fused pipeline of reference queryEmbedding (collection.go:496-559). */
  private def runQuery(
      qv: Array[Float],
      nResults: Int,
      where: Map[String, String],
      whereDocument: Map[String, String],
      negVector: Array[Float],
      negThreshold: Float): Seq[QueryResult] = {
    if (qv == null || qv.isEmpty)
      throw new IllegalArgumentException("queryEmbedding is empty")
    if (nResults <= 0)
      throw new IllegalArgumentException("nResults must be > 0")
    if (nResults > count())
      throw new IllegalArgumentException(
        "nResults must be <= the number of documents in the collection")
    Filters.validateWhereDocument(whereDocument, "unsupported operator")
    // Index path: exhaustive packed scan when no filters narrow the scan
    // set (filters would have pruned BEFORE scoring, collection.go:521).
    // ONE snap read: the index and the join-back rows come from the same
    // committed view — reading them through separate volatiles let a
    // concurrent commit pair an old index with the new state.
    readCommitted {
      val s = snap
      s.flat match {
        case Some(idx) if where.isEmpty && whereDocument.isEmpty && negVector == null =>
          val q = if (VectorFunctions.isNormalized(qv)) qv else VectorFunctions.normalize(qv)
          val top = idx.topK(q, nResults).sortBy { case (id, s) => (-s, id) }
          if (top.isEmpty) IndexedSeq.empty
          else {
            val scores = top.toMap
            val order = top.map(_._1).zipWithIndex.toMap
            // join-back materialization by id (reference collection.go:547-556)
            s.df0.filter(col("id").isInCollection(top.map(_._1).toIndexedSeq))
              .as[Document].collect()
              .map(d => QueryResult(d.id, d.metadata, d.embedding, d.content, scores(d.id)))
              .sortBy(r => order(r.id)).toIndexedSeq
          }
        case _ =>
          queryDF(qv, nResults, where, whereDocument, negVector, negThreshold)
            .as[QueryResult].collect().toIndexedSeq
      }
    }
  }

  /** Clause-combinator query ($and/$or/$not — reference roadmap,
    * README.md:179-180): same pipeline with a compiled clause predicate. */
  def queryEmbeddingWhere(
      queryEmbedding: Array[Float],
      nResults: Int,
      clause: Filters.Clause): Seq[QueryResult] = {
    if (queryEmbedding == null || queryEmbedding.isEmpty)
      throw new IllegalArgumentException("queryEmbedding is empty")
    if (nResults <= 0)
      throw new IllegalArgumentException("nResults must be > 0")
    if (nResults > count())
      throw new IllegalArgumentException(
        "nResults must be <= the number of documents in the collection")
    val q = if (VectorFunctions.isNormalized(queryEmbedding)) queryEmbedding
            else VectorFunctions.normalize(queryEmbedding)
    // same embedding-null guard as queryDF (see the comment there)
    readCommitted {
      df.filter(col("embedding").isNotNull)
        .filter(Filters.compile(clause))
        .withColumn("similarity", dot_const_f32(col("embedding"), q))
        .orderBy(desc("similarity"), asc("id"))
        .limit(nResults)
        .as[QueryResult].collect().toIndexedSeq
    }
  }

  /** Lazy DataFrame form of the query — for composition / explain / tests. */
  def queryDF(
      qv: Array[Float],
      nResults: Int,
      where: Map[String, String] = Map.empty,
      whereDocument: Map[String, String] = Map.empty,
      negVector: Array[Float] = null,
      negThreshold: Float = 0f): DataFrame = {
    // normalize query vector if needed (collection.go:530-532)
    val q = if (VectorFunctions.isNormalized(qv)) qv else VectorFunctions.normalize(qv)
    // Embedding-less rows (externally landed parquet read by
    // DB.persistent can carry them — Document.schema allows it) must
    // never reach the heap: their similarity is NULL, and once nResults
    // exceeds the embedded-row count the limit would admit them and
    // .as[QueryResult] would crash on the primitive similarity field.
    // The negVector branch filtered them implicitly (null <= thr is
    // never true); this keeps both paths agreeing explicitly.
    var plan = df.filter(col("embedding").isNotNull)
      .filter(Filters.predicate(where, whereDocument))
    if (negVector != null) {
      // NEGATIVE_MODE_FILTER: drop docs too similar to the negative
      // (query.go:221-231): keep negSim <= threshold.
      plan = plan.filter(dot_const_f32(col("embedding"), negVector) <= lit(negThreshold))
    }
    plan
      .withColumn("similarity", dot_const_f32(col("embedding"), q))
      // TakeOrderedAndProject = distributed bounded top-k heap (query.go:43-45)
      .orderBy(desc("similarity"), asc("id"))
      .limit(nResults)
  }

  // ------------------------------------------------------------------

  private def commit(next: DataFrame): Unit = {
    val materialized = persistRef match {
      case Some(p) => p.write(next); p.read(spark)
      case None =>
        // Cut plan lineage so repeated upserts don't grow an unbounded
        // union/anti-join tree (the in-memory analog of the reference's
        // "persist each mutation", collection.go:284-290).
        next.localCheckpoint(true)
    }
    // swap the whole view first (new state, no indexes), THEN release the
    // displaced indexes — after the swap no new reader can reach them.
    // The count stays EAGER here (hoisted: Snap's n is by-name now):
    // readCommitted's monitor-bounce relies on the commit finishing its
    // post-swap count before releasing this object's monitor
    val old = snap
    val nNext = materialized.count()
    snap = new Snap(materialized, nNext, None, None, None)
    old.flat.foreach(_.unpersist())
    old.lsh.foreach(_.unpersist())
    old.ivf.foreach(_.unpersist())
  }
}

/** Where/how a collection's rows live on disk (parquet + metadata sidecar). */
trait CollectionPersistence {
  def write(df: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
}


