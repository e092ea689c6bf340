ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chromemgospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through VERBATIM instead of sbt's
// LoggedOutput: the driver parses the bench stdout tail as JSON, and the
// "[info] " prefix LoggedOutput adds to every line left every committed
// BENCH_r*.json through r13 with "parsed": null — no line in the tail
// was bare JSON. Bench also writes bench_local/headline.json as a
// whole-file copy of the same line.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the committed 1M×1536 bench tier holds ~6 GB of packed
  // float blocks (the environment pledges 128 GiB; Xmx is a cap, not a
  // commitment). Override with SPARK_DRIVER_MEM for tighter machines —
  // Bench heap-guards the 1M tier and skips it below 18 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Commit + zero the whole heap at JVM start (-Xms=Xmx +
  // AlwaysPreTouch), default ON. The r13 build-number investigation
  // found the big-tier bench swings (17.9→240 s for identical code,
  // GC-time flat at <2.5 s) are first-touch page-commit cost landing
  // inside the first large allocation wave — pretouching moves it to
  // JVM startup, OUTSIDE every timed window (1M build: 240 s firstpass
  // → 4.6 s stable). Costs ~1 s per committed 10 GiB at JVM start;
  // SPARK_DRIVER_PRETOUCH=0 opts out for memory-tight machines.
) ++ (if (sys.env.get("SPARK_DRIVER_PRETOUCH").forall(v => v != "0" && v != "false"))
        Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
          "-XX:+AlwaysPreTouch")
      else Seq.empty)
