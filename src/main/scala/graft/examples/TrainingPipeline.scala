package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/**
 * End-to-end LLM training-data preparation over the `documents` table —
 * the pipeline a 100 TB corpus would run, at toy scale:
 *
 *   normalize → Gopher rules + quality + corpus-LM filter → exact dedup
 *   → MinHash near-dedup (cluster + survivor) → decontaminate vs a
 *   held-out set → temperature-mix sources → deterministic splits →
 *   sequence packing → per-source datasheet
 *
 * Every stage is a deterministic pure function of the data (md5 buckets,
 * integer quantization), so re-running yields byte-identical output —
 * the property that makes incremental 100 TB pipelines diffable.
 *
 *   sbt "runMain graft.examples.TrainingPipeline [sfDir]"
 */
object TrainingPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[*]")
      .appName("graft-training-pipeline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = spark.read.parquet(s"$dir/documents.parquet")
    println(s"raw:            ${raw.count()}")

    // 1. normalize + attach quality and corpus-typicality signals.
    //    Gopher word-count/stopword rules run first (integer verdicts,
    //    map-only) so pathological docs never reach the scored joins.
    //    The admitted set is MATERIALIZED before the LM trains on it:
    //    corpus-statistics models must see a pinned snapshot — in a lazy
    //    plan Catalyst may reorder the score predicate ahead of the
    //    admission filter and score docs outside the training corpus
    //    (lmScoreFast fails loudly on exactly that).
    val normed = raw.withColumn("text", TextAnalysis.normalizeText(col("text")))
    // (stopword rule omitted: the synthetic corpus has only "the" of
    // the eight required stopwords, so it would reject every doc)
    val gophered = TextAnalysis.gopherRules(normed, "text", minWords = 10)
      .filter(col("pass_word_count") && col("pass_symbol_ratio") &&
        col("pass_alpha"))
      .select(normed.columns.map(col).toIndexedSeq: _*)
      .localCheckpoint(true)
    val scored = gophered
      .join(TextAnalysis.lmScoreFast(gophered, "text", "doc_id")
        .select(col("doc_id"), col("avg_nats"), col("rare_frac")), "doc_id")
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
    val kept = scored.filter(col("quality") > 0.2 && col("rare_frac") < 0.5)
    println(s"quality-kept:   ${kept.count()}")

    // 2. exact dedup (content digest), then MinHash near-dedup:
    //    verified pairs -> connected components -> best-quality survivor
    val exact = Dedup.exactSurvivors(kept, "text", "doc_id")
    val pairs = Dedup.minhashDuplicates(exact, "text", "doc_id",
      threshold = 0.8)
    val survivors = Dedup.survivors(exact,
      pairs.select(col("id_a"), col("id_b")), "doc_id", col("quality"))
    println(s"post-dedup:     ${survivors.count()}")

    // 3. decontaminate against a fake "benchmark" slice (2% of docs):
    //    drop corpus docs sharing >50% of their 8-grams with it.
    //    The slice comes from `normed`, NOT `raw`: the corpus side was
    //    normalized in step 1, and n-gram matching is exact — comparing
    //    normalized corpus grams against un-normalized benchmark grams
    //    would under-count overlap and let contaminated docs through.
    //    benchmarkLeaks is the drop-training-docs direction: the SMALL
    //    benchmark gram set broadcasts and the corpus grams never
    //    shuffle (ngramContamination with the sides swapped would route
    //    the whole corpus gram stream through two shuffles — the wrong
    //    kernel for the shape this example claims to model)
    val benchmark = normed.filter(pmod(col("doc_id"), lit(50)) === 0)
    val overlap = Dedup.benchmarkLeaks(
      survivors, benchmark, "text", "doc_id", n = 8)
    val clean = survivors.join(
      overlap.filter(col("leak_frac") > 0.5)
        .select(col("train_id").as("doc_id")), Seq("doc_id"), "left_anti")
    println(s"decontaminated: ${clean.count()}")

    // 4. rebalance sources toward uniform (alpha = 0.7), then split + pack
    val mixed = Splits.temperatureSample(clean, "doc_id", "source", 0.7)
    val split = Splits.assign(mixed, "doc_id",
      Seq("train" -> 0.95, "val" -> 0.04, "test" -> 0.01))
    val packed = Packing.contiguousOffsets(
      split.filter(col("split") === "train"), "doc_id", "text",
      budgetTokens = 2048, shards = 4)
    // pack count = Σ per shard (max pack_last + 1): counting DISTINCT
    // pack_first rows would skip packs wholly interior to a document
    // that spans more than two pack boundaries (no row starts in them)
    val nPacks = packed.groupBy(col("shard"))
      .agg(max(col("pack_last")).as("__pl"))
      .agg(sum(col("__pl") + 1)).head().getLong(0)
    println(s"train-packed:   ${packed.count()} docs in $nPacks packs")

    // 5. training ORDER for the train split: curriculum tiers by
    //    LM-typicality quantile (typical text first), then the
    //    deterministic round-robin source interleave — both pure
    //    functions of the data, so the order is re-derivable
    val train = split.filter(col("split") === "train").localCheckpoint(true)
    val tiers = Splits.curriculumAssign(train, "text", "doc_id")
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
      .orderBy(col("tier"))
      .collect().map(r => s"t${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"curriculum:     $tiers")
    val order = Splits.interleaveBySource(train, "doc_id", "source")
    println(s"train order:    ${order.count()} positions " +
      s"(max ${order.agg(max(col("train_pos"))).head().getLong(0)})")

    // 6. learn a starter BPE merge table on the train split (vocabulary-
    //    bounded rounds — the corpus is scanned once), then APPLY it:
    //    per-doc token counts + a deterministic token-stream digest
    val merges = Bpe.learnMerges(train, "text", 5)
    println("bpe merges:     " +
      merges.map(m => s"${m.left}+${m.right}(${m.freq})").mkString(", "))
    val encoded = Bpe.encodeDocs(train, "text", "doc_id", merges)
    println(s"tokenized:      ${encoded.agg(sum(col("n_subwords"))).head().getLong(0)} " +
      "subword tokens")

    // 7. publish the dataset card: exact per-source counters of what
    //    survived the pipeline
    TextAnalysis.corpusDatasheet(mixed, "text", Seq("source"))
      .orderBy(col("source")).show(5, false)

    spark.stop()
  }
}
