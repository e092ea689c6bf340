package graft.examples

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.embed.HashingEmbeddingFunc
import graft.persist.ExportImport

/**
 * Runnable analog of the reference's S3 export/import example
 * (examples/s3-export-import/main.go): a DB snapshot streamed
 * gzip-compressed + AES-256-GCM-encrypted through the caller's
 * writer/reader pair — the exact seam the reference wires to a
 * `gocloud.dev/blob` bucket writer (db.ExportToWriter /
 * ImportFromReader). Here the "bucket" is an in-memory byte sink so the
 * example runs offline; any `OutputStream`/`InputStream` (S3 SDK,
 * HDFS, local file) plugs into the same two calls. The stream path
 * stages the ZIP on local disk and pipes it through chained
 * gzip/cipher streams, so driver memory stays O(copy buffer) —
 * for multi-GB collections prefer [[graft.persist.SnapshotStore]]
 * (parallel parquet, time travel).
 *
 *   sbt "runMain graft.examples.BlobExportImport"
 */
object BlobExportImport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[*]")
      .appName("graft-blob-export")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 32-byte key, as the reference requires (persistence.go:40-41)
    val key = "0123456789abcdef0123456789abcdef"

    // create + fill the source DB
    val src = DB.inMemory(spark, new HashingEmbeddingFunc(64))
    val c = src.createCollection("knowledge-base")
    c.addDocuments(Seq(
      Document("1", Map.empty, content = "The sky is blue because of Rayleigh scattering."),
      Document("2", Map.empty, content = "Columnar scans keep only the projected bytes hot.")))

    // export: gzip + AES-256-GCM through OUR writer (stand-in for the
    // reference's blob-bucket writer)
    val bucket = new ByteArrayOutputStream()
    ExportImport.exportToWriter(src, bucket, compress = true, encryptionKey = key)
    println(s"exported snapshot: ${bucket.size()} bytes (gzip+AES-GCM)")

    // import into a FRESH db from the reader side of the same bytes
    val dst = DB.inMemory(spark, new HashingEmbeddingFunc(64))
    ExportImport.importFromReader(dst, spark,
      new ByteArrayInputStream(bucket.toByteArray), encryptionKey = key)
    val restored = dst.getCollection("knowledge-base")
    println(s"imported collection holds ${restored.count()} documents")
    val hit = restored.query("why is the sky blue", nResults = 1).head
    println(f"round-trip query -> doc ${hit.id} (sim ${hit.similarity}%.3f)")
    spark.stop()
  }
}
