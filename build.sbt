ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chainhousespark"
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
// The driver greps run output for Bench's one-line JSON; sbt's default
// LoggedOutput wraps every forked line in "[info] " which breaks a
// line-wise json parse (BENCH_r2/r3 "parsed": null). StdoutOutput pipes
// the forked JVM's stdout/stderr through verbatim.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] on a 128 GiB box: 8g starves the 32-thread shuffle/cache
  // working set into GC thrash; 48g leaves ample headroom for the OS cache.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 75-query run generates hundreds of whole-stage-codegen classes;
  // the default 240m reserved code cache fills, the JIT stops compiling,
  // and late queries' hot loops run interpreted (observed as random
  // 8-10x spikes — kmeans 1.7s standalone vs 24s late in the bench JVM).
  "-XX:ReservedCodeCacheSize=1g",
)
