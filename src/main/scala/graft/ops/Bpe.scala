package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
 * Machine Translation of Rare Words with Subword Units" — public
 * literature): iteratively merge the most frequent adjacent symbol pair
 * across the corpus vocabulary. The learned merge list IS the tokenizer.
 *
 * Scale shape — the core trick is that BPE training never touches the
 * corpus after round 0: ONE corpus scan builds the (word, freq)
 * vocabulary (hash aggregate, output bounded by vocabulary size, not
 * corpus size), and every merge round runs over the vocab frame only —
 * a pair-count aggregate (vocabulary-bounded) plus a map-only merge
 * rewrite. The driver receives exactly one row per round (the argmax
 * pair via a bounded top-1), mirroring every production BPE trainer.
 *
 * Determinism contract: pair counts are exact integer sums and the
 * argmax tie-breaks on (freq DESC, left ASC, right ASC); the merge
 * rewrite is a plain string replace with both engines' left-to-right
 * non-overlapping semantics, over a canonical "space word, two spaces
 * between symbols" encoding — two adjacent pattern occurrences share no
 * delimiter, so back-to-back pairs (`a b a b`) merge in one pass and
 * overlapping runs (`a a a`) merge greedily left-to-right exactly like
 * reference BPE. Everything is SQL-replayable.
 *
 * Vocabulary is restricted to `^[a-z]+$` words after lowercasing (the
 * classic pre-tokenized-letters setup; it also sidesteps engine
 * disagreement on multi-byte character indexing).
 */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** The canonical symbol-string encoding: leading/trailing single
    * space, TWO spaces between symbols; round 0 symbols = characters. */
  private def initialSymbols(word: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** (word, freq) vocabulary — the single corpus-sized aggregate. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /**
   * Learn `numMerges` merges; returns them in rank order.
   *
   * Two tiers, chosen by vocabulary size — NOT corpus size. The corpus
   * scan (the only corpus-sized work) is always distributed; the merge
   * loop runs over the (word, freq) vocabulary, which is bounded by
   * unique-word count regardless of corpus bytes:
   *
   *  - `≤ maxLocalVocab` entries (default 4M ≈ a few hundred MB):
   *    collect the vocab ONCE and run the rounds driver-locally — one
   *    Spark job total instead of one-plus per round. This is the shape
   *    of every production BPE trainer; at 100 TB the corpus scan
   *    dominates and the local loop is noise.
   *  - larger: the fully distributed per-round pair-count path.
   *
   * Both tiers implement the identical determinism contract (exact
   * integer counts, argmax tie-break freq DESC / left ASC / right ASC,
   * greedy left-to-right non-overlapping merge), so the tier switch is
   * invisible in results.
   */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxLocalVocab: Int = 4000000): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val vocab = vocabulary(df, textCol)
    val probe = vocab.limit(maxLocalVocab + 1).collect()
    if (probe.length <= maxLocalVocab)
      learnMergesLocal(
        probe.map(r => (r.getString(0), r.getLong(1))), numMerges)
    else learnMergesDistributed(vocab, numMerges)
  }

  /** Driver-local merge rounds over a collected bounded vocabulary. */
  private def learnMergesLocal(
      vocab: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    // (symbols, freq) per word; symbols start as single characters
    val words: Array[(Array[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var cur = words
    for (r <- 1 to numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      cur.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) return merges.toSeq
      // argmax: freq DESC, then left ASC, right ASC — same contract as
      // the distributed orderBy
      val ((l, rr), f) = counts.reduce { (a, b) =>
        val cmp = java.lang.Long.compare(a._2, b._2)
        if (cmp > 0) a else if (cmp < 0) b
        else {
          val lc = a._1._1.compareTo(b._1._1)
          if (lc < 0) a else if (lc > 0) b
          else if (a._1._2.compareTo(b._1._2) <= 0) a else b
        }
      }
      merges += Merge(r, l, rr, f)
      // greedy left-to-right non-overlapping merge — identical to the
      // canonical-string replace() semantics of the distributed tier
      cur = cur.map { case (syms, fr) =>
        if (syms.length < 2) (syms, fr)
        else {
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              out += l + rr; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, fr)
        }
      }
    }
    merges.toSeq
  }

  /** Distributed per-round path for vocabularies too large to collect. */
  private def learnMergesDistributed(
      vocab: DataFrame,
      numMerges: Int): Seq[Merge] = {
    var state = vocab
      .select(initialSymbols(col("word")).as("s"), col("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist lags one round: round r's collect materializes state_r,
    // after which state_{r-1} (its parent) is safe to evict without
    // forcing a recompute chain back to the vocabulary
    var prevState: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    try {
      for (r <- 1 to numMerges) {
        val syms = split(trim(col("s")), "  ")
        // single-symbol words contribute no pairs; guard the sequence —
        // Spark's sequence(1, 0) would DESCEND, not produce empty
        val pairs = when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(syms) - 1),
            i => struct(element_at(syms, i).as("l"),
              element_at(syms, i + 1).as("r"))))
        val top = state
          .select(explode(pairs).as("pair"), col("f"))
          .groupBy(col("pair.l").as("l"), col("pair.r").as("r"))
          .agg(sum("f").as("freq"))
          .orderBy(desc("freq"), col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) return merges.toSeq // nothing left to merge
        // state_r is materialized by the collect above — its parent can go
        if (prevState != null) { prevState.unpersist(); prevState = null }
        val (l, rr, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(r, l, rr, f)
        val next = state.withColumn("s",
            replace(col("s"), lit(s" $l  $rr "), lit(s" $l$rr ")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prevState = state
        state = next
      }
      merges.toSeq
    } finally {
      state.unpersist()
      if (prevState != null) prevState.unpersist()
    }
  }

  /** Gate shape: the merge table as a DataFrame (rank, left, right, freq). */
  def learnMergesDF(spark: SparkSession, df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    learnMerges(df, textCol, numMerges)
      .map(m => (m.rank.toLong, m.left, m.right, m.freq))
      .toDF("rank", "left", "right", "freq")
  }

  /**
   * Apply a learned merge list to segment words into subword tokens —
   * map-only over any frame carrying a word column (merges applied in
   * rank order, same replace semantics as training).
   */
  def segment(df: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val merged = merges.foldLeft(initialSymbols(col(wordCol))) {
      case (acc, m) =>
        replace(acc, lit(s" ${m.left}  ${m.right} "), lit(s" ${m.left}${m.right} "))
    }
    df.withColumn("subwords", split(trim(merged), "  "))
  }

  /**
   * Tokenize whole DOCUMENTS under a merge table — the "apply the
   * tokenizer" pipeline stage that turns a cleaned corpus into token
   * counts and a content fingerprint ahead of packing/budgeting.
   * Vocabulary domain matches training ([[vocabulary]]): lowercase
   * `[a-z]+` words; anything else is not a trainable symbol and is
   * skipped. Each word is segmented exactly as [[segment]] does (merges
   * in rank order, shared left-to-right non-overlapping `replace`
   * semantics), and the per-doc output is (n_words, n_subwords,
   * md5 over the space-joined subword sequence) — a deterministic,
   * engine-portable digest of the full token stream.
   *
   * Scale shape: ONE codegen projection per document — the word split,
   * per-word merge folds, and digest all run inside `transform`/
   * `flatten` lambdas on the scan, ZERO exchanges (tokenizing 100 TB is
   * embarrassingly parallel and must not shuffle). The merge table
   * rides in the plan as literals (vocabulary-bounded by construction).
   */
  def encodeDocs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = filter(split(lower(col(textCol)), " "),
      w => w.rlike("^[a-z]+$"))
    val enc = (w: Column) => {
      val init = concat(lit(" "), rtrim(regexp_replace(w, "(.)", "$1  ")), lit(" "))
      val merged = merges.foldLeft(init) { case (acc, m) =>
        replace(acc, lit(s" ${m.left}  ${m.right} "), lit(s" ${m.left}${m.right} "))
      }
      split(trim(merged), "  ")
    }
    // compute the subword array ONCE in an intermediate projection:
    // `enc` is a |merges|-deep replace() chain per word and the
    // higher-order transform evaluates interpreted (CodegenFallback),
    // so two inline copies of flatten(transform(words, enc)) really DID
    // run the whole merge fold twice per row — doubling the most
    // expensive projection in the pipeline at a realistic merge-table
    // size
    df.select(col(idCol).as("doc_id"),
        size(words).cast("long").as("n_words"),
        flatten(transform(words, enc)).as("__subwords"))
      .select(col("doc_id"), col("n_words"),
        size(col("__subwords")).cast("long").as("n_subwords"),
        md5(concat_ws(" ", col("__subwords"))).as("tokens_md5"))
  }
}
