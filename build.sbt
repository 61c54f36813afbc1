ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vcfpgloaderspark"
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
// Driver bench-parse contract (r18 verdict #2): the driver captures the
// bench's stdout and parses the final JSON metrics line, but the default
// forked-run output strategy routes the child's stdout through sbt's
// logger, prefixing every line with "[info] " — and sbt appends its own
// "[success] Total time ..." trailer as the true last line. Both broke
// the parse in all 19 committed BENCH_r*.json (parsed: null). Fix:
// forked run/runMain output goes STRAIGHT to stdout (no prefix, immune
// to log level), and the success trailer is suppressed build-wide, so
// the bench's own final println is the last stdout line. Test-framework
// summaries are unaffected (they flow through sbt's test reporter, not
// the forked process's stdout).
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command layer, not by a task — exclude it
// from the unused-key lint noise
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK 17 GCLocker starvation: 32 concurrent tasks mixing JNI critical
  // sections (parquet/snappy) with 8 MB TaskMemoryManager page allocs can
  // fail an allocation after only the default TWO GCLocker retries and
  // throw a spurious heap OOM with gigabytes free ("Retried waiting for
  // GCLocker too often" — observed killing a bench run mid-write). Give
  // the allocator a real retry budget.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=32",
)
