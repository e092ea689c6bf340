package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (and, via getOrCreate, per JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def withLogLevel[A](f: => A): A = { spark.sparkContext.setLogLevel("ERROR"); f }

  lazy val testEmbeddings: Map[String, Array[Float]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/test_embeddings.json"), "UTF-8").mkString
    graft.persist.Json.parse(src).asInstanceOf[Map[String, Any]].map {
      case (k, v) => k -> v.asInstanceOf[List[Any]]
        .map(x => x.asInstanceOf[Double].toFloat).toArray
    }
  }
}
