ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "octopufsspark"
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
// Pass the forked run's stdout through RAW (no "[info] " prefix): the
// bench driver parses the ONE JSON line Bench prints, and sbt's default
// logged output strategy prefixes it into unparseability (BENCH_r06-r09
// all carry "parsed: null" for exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Pinned bench environment (r13 verdict task 7): the forked JVM used
// to inherit default heap sizing + GC, so bench artifacts from
// different windows could differ by GC ergonomics alone. Explicit GC,
// Xms == Xmx (no heap-resize pauses mid-pass); Bench records the
// resulting flags + max heap in the artifact's `jvm` header.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
  // r15: Xms only RESERVES; Linux commits heap pages on first touch, so
  // at the driver's 89 g heap the shuffle-heavy pair-join family paid
  // continuous page-fault+zeroing cost inside measured windows (d15
  // 5.5-6.1 s isolated vs 2.7 s at 8 g — bisect in docs/PERF_NOTES.md).
  // PreTouch moves the whole commit to JVM startup: d13 3.6→1.9 s,
  // d15 5.5→1.9 s, spreads collapse. Costs a few seconds of extra JVM
  // boot — outside every timing window.
  "-XX:+AlwaysPreTouch",
  // r16: the 222-query suite's whole-stage-codegen classes overflow the
  // default segmented code cache (~117 MB non-profiled); the official r15
  // bench hit "CodeHeap 'non-profiled nmethods' is full. Compiler has
  // been disabled" at uptime 2440 s of 3139, so the run's tail executed
  // interpreted/C1. 512 MB keeps every generated class JIT-compiled for
  // the full suite; Bench records it in the artifact's `jvm` header.
  "-XX:ReservedCodeCacheSize=512m",
)
