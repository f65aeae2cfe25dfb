ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "thymeflowbackspark"
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
// The bench's one-line JSON contract: the forked process must write
// straight to stdout, NOT through sbt's run logger, which decorates
// every line with "[info] " — that prefix has made the driver's JSON
// parse fail in every round to date (BENCH_r*.json: parsed null).
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
  // Default sized to the 128 GiB harness host: the driver's own bench run
  // injects ~96g, and an 8g default was the one divergence left between
  // local runs and the driver artifact (GC pressure shows up as
  // repeat-slower-than-cold drift on the window-heavy queries).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Whole-stage codegen emits one compiled class per plan fragment; a
  // 2x21-query bench run churns hundreds of them through the JIT. The
  // JDK default 240m code cache fills mid-run and silently disables the
  // compiler — the repeat-phase 10-20x collapses (q25/q26) trace to this.
  "-XX:ReservedCodeCacheSize=1g",
)
