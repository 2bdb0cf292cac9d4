ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vfsspark"
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
// Forked run output must reach stdout RAW (no sbt [info]/[error] log
// prefixes): the bench driver parses Bench's single JSON line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JIT-compiled code headroom (r19): one bench/Verify run loads tens
  // of thousands of classes (framework + per-plan generated code) and
  // the default 240 MB ReservedCodeCacheSize runs its profiled-code
  // segment into sweeper churn late in a long suite — evicted hot
  // nmethods re-interpret until recompiled, the same storm the
  // kernel warm-up fights. 512 MB is the standard setting for large
  // JVM workloads (sbt itself recommends it); it is core-count- and
  // host-independent, reserved (not committed) address space.
  "-XX:ReservedCodeCacheSize=512m",
)
// Extra JVM flags for the forked run/test JVMs, passed via env —
// the measurement hook for JIT/codecache experiments (r19): e.g.
// GRAFT_JVM_EXTRA="-XX:+PrintCompilation" sbt "runMain graft.Bench"
javaOptions ++= sys.env.get("GRAFT_JVM_EXTRA").map(_.trim)
  .filter(_.nonEmpty).map(_.split("\\s+").toSeq)
  .getOrElse(Seq.empty[String])
// Spark suites share one JVM-wide SparkContext; run them serially.
Test / parallelExecution := false
