ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "geobigdataanalysisspark"
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
// Forked `run` output passes through sbt's logger by default, which prefixes
// every line with [info] — that broke the bench driver's JSON-line parse
// (BENCH_r01/r02 "parsed": null). StdoutOutput inherits the parent's stdout
// unprefixed, so graft.Bench's one-line summary survives tail-capture intact.
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  // Single-JVM local[32] on a 128 GiB box: 8g forces GC pressure + block
  // eviction once the suite's checkpointed state accumulates (measured as
  // 9 s → 31 s run-to-run variance on the DBSCAN query).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Opt-in GC log: emit the flag only when requested — "-Xlog:gc:none"
  // makes the JVM log to a FILE literally named "none".
) ++ sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc:file=$f").toSeq ++
  // Generic forked-JVM flag hook for A/B experiments (code cache sizing,
  // JIT logging) without editing the build per run. filter(_.nonEmpty):
  // an empty/whitespace-only value would otherwise inject a literal ""
  // JVM option and every forked run dies with "Could not find or load
  // main class" (ADVICE r9).
  sys.env.get("SPARK_EXTRA_JVM_OPTS").toSeq
    .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
