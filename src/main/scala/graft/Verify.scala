package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only these queries (local iteration aid;
    // the driver always passes exactly two args = full run)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which Spark has no native
      // type for; read as long nanos and convert in the query.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce folds the whole
      // upstream pipeline into ONE task for map-only plans (a 50k-doc
      // explode query becomes minutes of single-core work); repartition
      // keeps the query parallel and only the final write is one file.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // drop any STALE dump from a previous run into the same outDir:
        // a failure BEFORE the overwrite touches the directory would
        // otherwise leave old bytes for the oracle to compare against
        // this run's SQL — a plausible-looking result on stale data
        // instead of a loud missing-output failure
        try graft.persist.Persistence.deleteTree(Paths.get(s"$outDir/$name"))
        catch { case _: Throwable => () }
      }
    }
    // JSON string escape = the ONE shared implementation
    // (graft.persist.Json.str escapes backslash, quote, and all control
    // chars <0x20 — a tab or CR in builder-authored SQL would otherwise
    // make the driver's json.load fail and silently zero the round).
    // Under an `only` subset the dump is filtered to the queries that
    // actually ran: a full dump would hand the oracle stale GateStage
    // globs for staged queries this run never wrote.
    def q(s: String): String = graft.persist.Json.str(s)
    // Scope-explicit dump: this run's sf dir resolves the GateStage
    // globs, so a JVM that staged several scopes (two-sf spec runs)
    // still dumps readable oracle SQL instead of the ambiguity sentinel.
    val json = SparkEntry.oracleSqlScoped(sfDir)
      .filter { case (k, _) => only.isEmpty || only.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
