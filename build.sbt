ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nonconsumptivespark"
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
// Forked run output goes straight to stdout, WITHOUT sbt's `[info]` log
// prefix: the round driver parses Bench's one-line JSON from stdout and the
// framing broke its parser in round 1 (BENCH_r01 "parsed": null).
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
  // non-ASCII fixture filenames (Unicode-id coverage) need UTF-8 filename
  // handling regardless of the launching locale
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The test JVM is ONE fork shared by all ~38 suites — a full-registry
// plan scan, ANN fits at production codebook geometry, and multi-delta
// artifact soaks accumulate heap pressure the 8g run-default doesn't
// survive (round 14: StreamingSpec OOM'd mid-AQE-explain at 8g). The
// last -Xmx on the command line wins, so this appends a higher floor
// for tests only; SPARK_GRAFT_TEST_MEM overrides.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "16g")}"
