ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pygdfspark"
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
// Pass the forked JVM's stdout through RAW instead of re-logging each line
// with an "[info] " prefix: graft.Bench prints one machine-read JSON summary
// line, and the driver's stdout-tail parser must see it unprefixed.
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
  // The forked JVM is driver AND executor (local mode): 32 concurrent
  // tasks share one heap, and allocation-heavy stages were GC-throttled
  // at the old 8g default (taskMetrics showed executorRunTime ~10x
  // executorCpuTime with jvmGCTime the gap; r19 bench A/B on a 128 GiB
  // box: 8g 131.4 s min-sum vs 24g 114.2 s over the same 343 queries).
  // Still env-overridable for memory-constrained hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // GC selectable for A/B (default JVM choice when unset)
) ++ sys.env.get("GRAFT_GC").map(gc => s"-XX:+Use${gc}GC").toSeq
