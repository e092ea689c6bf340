package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.embed.EmbeddingFunc
import graft.persist.{ParquetPersistence, Persistence}

/**
 * The database: a named registry of collections — parity with reference
 * db.go:29-38. Catalog mutations are synchronized on the driver (replacing
 * collectionsLock, db.go:31); collection state itself is immutable
 * DataFrames, so readers never block.
 */
class DB private (
    spark: SparkSession,
    persistRoot: Option[String],
    defaultEmbed: EmbeddingFunc,
    compression: Option[String] = None) {

  private val collections = TrieMap.empty[String, Collection]

  /** Create — reference db.go:498-514. Overwrites any same-named entry. */
  def createCollection(
      name: String,
      metadata: Map[String, String] = Map.empty,
      embeddingFunc: EmbeddingFunc = null): Collection = synchronized {
    if (name == null || name.isEmpty)
      throw new IllegalArgumentException("collection name is empty")
    val ef = Option(embeddingFunc).getOrElse(defaultEmbed)
    val persist = persistRoot.map { root =>
      val dir = Persistence.collectionDir(root, name)
      Persistence.writeMetadata(dir, name, metadata)
      new ParquetPersistence(dir, compression)
    }
    val c = new Collection(name, metadata, ef, spark, None, persist)
    collections.put(name, c)
    c
  }

  /** Lookup; re-attaches the embedding func when provided (functions
    * don't persist, db.go:536-537, 552-558). Returns null when absent —
    * Go-style, db.go:543-560. Synchronized like every other registry
    * MUTATION: the re-attach path writes to the registry, and an
    * unsynchronized put could race deleteCollection and resurrect a
    * just-deleted collection over its removed directory. */
  def getCollection(name: String, embeddingFunc: EmbeddingFunc = null): Collection =
    collections.get(name) match {
      case Some(c) if embeddingFunc != null && (c.embedFunc ne embeddingFunc) =>
        synchronized {
          // re-check under the lock — the entry may have been deleted
          // (or already re-attached by a racing caller) since the read
          collections.get(name) match {
            case Some(cur) if cur.embedFunc ne embeddingFunc =>
              val reattached = cur.withEmbeddingFunc(embeddingFunc)
              collections.put(name, reattached)
              reattached
            case other => other.orNull
          }
        }
      case other => other.orNull
    }

  /** Get-or-create — reference db.go:569-580. Routes through
    * getCollection so an existing collection (e.g. reloaded from disk
    * with the default embedder) gets the CALLER's embedding func
    * re-attached, exactly like the reference's GetCollection path
    * (db.go:552-558) — otherwise text queries would silently embed with
    * the wrong function. */
  def getOrCreateCollection(
      name: String,
      metadata: Map[String, String] = Map.empty,
      embeddingFunc: EmbeddingFunc = null): Collection = synchronized {
    val existing = getCollection(name, embeddingFunc)
    if (existing != null) existing else createCollection(name, metadata, embeddingFunc)
  }

  /** Copy of the registry — reference db.go:523-533. */
  def listCollections(): Map[String, Collection] = collections.readOnlySnapshot().toMap

  /** Drop + remove directory; no-op if absent — reference db.go:586-605. */
  def deleteCollection(name: String): Unit = synchronized {
    if (name == null || name.isEmpty)
      throw new IllegalArgumentException("collection name is empty")
    collections.remove(name)
    persistRoot.foreach { root =>
      deleteRecursively(Persistence.collectionDir(root, name))
    }
  }

  /** Drop everything — reference db.go:610-629. */
  def reset(): Unit = synchronized {
    collections.clear()
    persistRoot.foreach { root =>
      deleteRecursively(Paths.get(root))
      Files.createDirectories(Paths.get(root))
    }
  }

  // the shared helper closes the Files.walk stream — the previous local
  // copy leaked one directory handle per deleteCollection/reset call
  private def deleteRecursively(p: Path): Unit = Persistence.deleteTree(p)

  /** Snapshot export — reference db.go:384-433 (see persist.ExportImport). */
  def exportToFile(
      filePath: String,
      compress: Boolean = false,
      encryptionKey: String = "",
      collections: Seq[String] = Seq.empty): Unit =
    graft.persist.ExportImport.exportToFile(
      this, filePath, compress, encryptionKey, collections)

  /** Snapshot import; overwrites same-named collections — db.go:208-280. */
  def importFromFile(
      filePath: String,
      encryptionKey: String = "",
      collections: Seq[String] = Seq.empty): Unit =
    graft.persist.ExportImport.importFromFile(
      this, spark, filePath, encryptionKey, collections)

  /** Deprecated alias — reference db.go:193-195. */
  @deprecated("use importFromFile", "0.1.0")
  def importDB(filePath: String, encryptionKey: String = ""): Unit =
    importFromFile(filePath, encryptionKey)

  /** Deprecated alias — reference db.go:368-370. */
  @deprecated("use exportToFile", "0.1.0")
  def exportDB(filePath: String, compress: Boolean = false,
      encryptionKey: String = ""): Unit =
    exportToFile(filePath, compress, encryptionKey)

  private[graft] def register(c: Collection): Unit = collections.put(c.name, c)
  private[graft] def sparkSession: SparkSession = spark
  private[graft] def root: Option[String] = persistRoot
  private[graft] def defaultEmbeddingFunc: EmbeddingFunc = defaultEmbed
}

object DB {
  /** In-memory DB — reference NewDB (db.go:45-50). */
  def inMemory(spark: SparkSession, defaultEmbed: EmbeddingFunc): DB =
    new DB(spark, None, defaultEmbed)

  /** Persistent DB: open-or-create root, load existing collections —
    * reference NewPersistentDB (db.go:68-181). */
  def persistent(spark: SparkSession, root: String, defaultEmbed: EmbeddingFunc): DB =
    persistent(spark, root, defaultEmbed, compress = false)

  /** Persistent DB with the reference's `compress` knob (db.go:57-66):
    * `compress = true` writes this DB's collection files with gzip parquet
    * compression instead of the session codec. Existing data re-compresses
    * lazily on the next state commit; reads are codec-agnostic. */
  def persistent(spark: SparkSession, root: String, defaultEmbed: EmbeddingFunc,
      compress: Boolean): DB = {
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath) && !Files.isDirectory(rootPath))
      throw new IllegalArgumentException(s"path is not a directory: $root")
    Files.createDirectories(rootPath)
    val codec = if (compress) Some("gzip") else None
    val db = new DB(spark, Some(root), defaultEmbed, codec)
    Persistence.listCollectionDirs(root).foreach { dir =>
      val (name, md) = Persistence.readMetadata(dir)
      val persist = new ParquetPersistence(dir, codec)
      val df = persist.read(spark)
      db.register(new Collection(name, md, defaultEmbed, spark, Some(df), Some(persist)))
    }
    db
  }
}
