ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ecommercedataengineeringprojectspark"
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
// Pass forked-run stdout through verbatim: Bench/Verify print a single
// machine-read JSON line, and sbt's default logger would prefix it with
// "[info] ", breaking the driver's line parse.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: local[32] is one JVM playing driver AND all 32
  // executor threads; at 8g the bench's x10/x30 corpus entries ran
  // with little headroom over Spark's unified memory region, and a
  // squeezed old-gen shows up as multi-x wall-clock wobble (BENCH_r03
  // x10_q65) long before an OOM. The sandbox has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 512m code cache (default 240m): headroom for multi-query sessions
  // that pin ~1000 generated classes' JIT'd code via the codegen cache
  // (GraftSession). Measured footprint over the full 44-entry bench is
  // 131 MB (diag code_cache_mb) — this is insurance for sessions
  // several times longer, not a fix for an observed flush regime.
  "-XX:ReservedCodeCacheSize=512m",
)
