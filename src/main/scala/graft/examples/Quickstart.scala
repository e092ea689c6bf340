package graft.examples

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.embed.HashingEmbeddingFunc

/**
 * Runnable port of the reference quickstart (README.md:204-256):
 * create a collection, add documents with metadata, run a filtered
 * similarity query. Uses the deterministic local embedder so it runs
 * offline; swap in OpenAIEmbedding/OllamaEmbeddingFunc for real vectors.
 *
 *   sbt "runMain graft.examples.Quickstart"
 */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[*]")
      .appName("graft-quickstart")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val db = DB.inMemory(spark, new HashingEmbeddingFunc(128))
    val c = db.createCollection("knowledge-base")

    c.addDocuments(Seq(
      Document("1", Map("category" -> "technology"),
        content = "The quick brown fox jumps over the lazy dog"),
      Document("2", Map("category" -> "climate"),
        content = "The sea is rising due to climate change and melting ice"),
      Document("3", Map("category" -> "climate"),
        content = "Global warming accelerates glacier melt in the alps"),
      Document("4", Map("category" -> "technology"),
        content = "Distributed query engines scan columnar storage in parallel")))

    println(s"collection '${c.name}' holds ${c.count()} documents\n")

    val res = c.query("warming climate sea ice", nResults = 2,
      where = Map("category" -> "climate"))
    res.foreach(r => println(f"  ${r.id}  sim=${r.similarity}%.4f  ${r.content}"))

    val negative = c.queryWithOptions(QueryOptions(
      queryText = "climate and computing",
      nResults = 2,
      negative = NegativeQueryOptions(
        mode = NegativeMode.Subtract, text = "weather ocean ice")))
    println("\nwith negative 'weather ocean ice' subtracted:")
    negative.foreach(r => println(f"  ${r.id}  sim=${r.similarity}%.4f  ${r.content}"))

    spark.stop()
  }
}
