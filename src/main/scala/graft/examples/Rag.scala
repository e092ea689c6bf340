package graft.examples

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.embed.HashingEmbeddingFunc

/**
 * Runnable analog of the reference's RAG example
 * (examples/rag-wikipedia-ollama/main.go): a persistent DB whose
 * collection survives restarts, article ingest on first run only
 * (`count() == 0` gate, main.go:60-62), retrieval of the top-k
 * passages for a question, and prompt assembly for a chat model.
 *
 * Differences from the reference, by construction of this container:
 *  - articles come from the synthetic documents parquet instead of the
 *    DBpedia JSONL sample (the reference streams dbpedia_sample.jsonl);
 *  - embeddings use the deterministic offline [[HashingEmbeddingFunc]];
 *    swap in `graft.embed.OllamaEmbeddingFunc("nomic-embed-text")` for
 *    the reference's exact setup (same wire contract, ProvidersSpec);
 *  - the final LLM call (main.go askLLM → Ollama chat) is STUBBED as a
 *    printout of the assembled prompt — there is no model server here.
 *    The retrieval-augmentation seam is identical: context passages in,
 *    grounded answer out.
 *
 *   sbt "runMain graft.examples.Rag"
 */
object Rag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[*]")
      .appName("graft-rag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val question = "What do the filter benchmarks measure?"

    // persistent DB: restart-safe, like chromem.NewPersistentDB("./db")
    val db = DB.persistent(spark, "target/rag-db", new HashingEmbeddingFunc(128))
    val articles = db.getOrCreateCollection("Wikipedia")

    // ingest only when the collection wasn't loaded from disk —
    // the reference's count()==0 gate. DISTRIBUTED ingest: fromParquet
    // conforms the table to the collection schema and addDF embeds
    // missing vectors per partition — no driver-side collect/loop (a
    // corpus beyond driver memory would OOM a collect-and-re-upload,
    // and DocumentSource exists precisely to avoid that shape)
    if (articles.count() == 0) {
      println("First run: ingesting articles...")
      articles.addDF(graft.sources.DocumentSource.fromParquet(
        spark, "/root/testdata/sf0.001/documents.parquet",
        contentField = "text", idField = "doc_id",
        metadataFields = Seq("lang")))
    }
    println(s"collection holds ${articles.count()} articles")

    // retrieval: top-2 passages for the question
    val hits = articles.query(question, nResults = 2)
    hits.foreach(h =>
      println(f"  [sim ${h.similarity}%.3f] doc ${h.id}: ${h.content.take(70)}..."))

    // augmentation: the prompt the chat model would receive. The
    // reference sends this to Ollama (llm.go systemPromptTpl) — here the
    // call is stubbed; plug any chat client into `askLLM`.
    // stripMargin on the TEMPLATE only, then splice the passages in:
    // interpolating first would let stripMargin eat "|"-prefixed lines
    // INSIDE retrieved content (markdown tables, ASCII art) and corrupt
    // the prompt relative to the stored passage
    val results = hits.zipWithIndex.map { case (h, i) =>
      s"<result id=${i + 1}>${h.content}</result>" }.mkString("\n")
    val prompt =
      """You are a helpful assistant. Answer the question using ONLY the
        |provided search results.
        |
        |%s
        |
        |Question: %s""".stripMargin.format(results, question)
    println("\n--- prompt for the chat model ---\n" + prompt)
    println("\n[askLLM stub] no model server in this environment — " +
      "wire an HTTP chat client here (the retrieval above is the RAG part).")
    spark.stop()
  }
}
