package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Splits}
import graft.persist.SnapshotStore

/**
 * Incremental corpus ingest — the nightly loop of a 100 TB pipeline, at
 * toy scale:
 *
 *   new crawl batch
 *     → exact self-dedup
 *     → cross-corpus near-dedup against the CURRENT snapshot
 *       (minhash batch×corpus banded join — the corpus is scanned once)
 *     → commit surviving union as the next snapshot VERSION
 *     → time-travel diff (what did tonight's run change?)
 *     → leakage-safe re-split (near-dup clusters never straddle sides)
 *
 * Every stage is a deterministic pure function of the data, and the
 * snapshot store keeps prior versions readable — so tonight's run is
 * diffable, auditable, and reproducible.
 *
 * Streaming form: `graft.streaming.CorpusIngest.dedupedIngest` runs the
 * same self-dedup → cross-corpus-filter → commit loop continuously via
 * foreachBatch (stream ≡ batch pinned in StreamingSpec).
 *
 *   sbt "runMain graft.examples.IncrementalIngest [sfDir]"
 */
object IncrementalIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-incremental-ingest")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // day 0 corpus = 80% of docs; tonight's batch = the rest plus some
    // exact re-crawls (duplicates the pipeline must drop)
    val corpus0 = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .unionByName(corpus0.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))

    val store = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("graft-ingest").toString)
    val v1 = store.commit(corpus0)
    println(s"v$v1 corpus:      ${store.read(spark, v1).count()} docs")

    // 1. self-dedup the batch, then drop near-dups of the live corpus
    val batchClean = Dedup.exactSurvivors(batch, "text", "doc_id")
    val fresh = Dedup.newAgainstCorpus(
      batchClean, store.read(spark, v1), "text", "doc_id", threshold = 0.8)
    println(s"batch:          ${batch.count()} → ${fresh.count()} after dedup")

    // 2. commit the union as the next version; diff the two versions
    val v2 = store.commit(store.read(spark, v1).unionByName(fresh))
    val d = store.diff(spark, v1, v2, "doc_id")
    println(s"v$v2 diff:        " + d.groupBy("change").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", "))

    // 3. leakage-safe split of the new corpus (near-dup clusters stick)
    val corpus = store.readLatest(spark)
    val pairs = Dedup.minhashDuplicates(corpus, "text", "doc_id", 0.8)
      .select("id_a", "id_b")
    val split = Splits.leakageSafeAssign(corpus, "doc_id", pairs,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    println("split sizes:    " + split.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", "))

    spark.stop()
  }
}
