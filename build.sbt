ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dativoingestspark"
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
// Raw (unprefixed) stdout for forked runMain: the benchmark/verify
// drivers parse JSON lines from program output, and sbt's default
// LoggedOutput strategy prepends "[info] " to every line, which makes
// `{"metric":...}` unparseable to any reader that expects a line
// starting with '{'.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // The full bench compiles unique whole-stage-codegen classes for
  // ~140 queries x 3 reps in ONE JVM; the JDK default 240 MB code
  // cache can fill mid-suite, silently disabling the JIT for every
  // query after it — the one slowdown that grows with the suite and
  // that a fresh-JVM isolated run never reproduces. Bench emits
  // cc_used_mb/cc_max_mb per run so the artifact shows the headroom.
  "-XX:ReservedCodeCacheSize=512m",
)
