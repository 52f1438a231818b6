ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetimporterspark"
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
// Default `sbt test` excludes the planted-scale/lifecycle soak tests
// (tagged graft.SlowTest) so the suite fits the driver's verify budget —
// a timed-out gate can hide a real red (round-14 verdict). Opt back in
// with SPARK_GRAFT_SLOW_TESTS=1 (full suite) or
// `testOnly * -- -n graft.SlowTest` (soaks only).
Test / testOptions ++= (
  if (sys.env.contains("SPARK_GRAFT_SLOW_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")))
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
  // Guide §5 (memory): at local[32] one JVM is both driver and all
  // executors — 32 concurrent tasks + session memos + checkpoint blocks
  // thrash an 8g heap (measured: q101 21.9 s at 8g vs 3.6 s at 24g,
  // q60 12.8 vs 8.3, q93 10.0 vs 5.9 — pure GC tax, identical plans).
  // 24g is ~20% of the 128 GiB sandbox; still env-overridable, and on a
  // real cluster executor sizing is the deploy's concern, not this file's.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
