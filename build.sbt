ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "demodatawarehousespark"
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
// The driver json-parses a ~2000-char TAIL of `sbt "runMain ..."`
// stdout as ONE document. Two things defeat that with sbt defaults:
// the logger's `[info] ` prefix on every forked-process line, and the
// trailing `[success] Total time: ...` line. StdoutOutput passes the
// forked JVM's stdout through VERBATIM (bare JSON at column 0);
// showSuccess drops the trailer — so the bench summary line is the
// LAST bare line on stdout, exactly what the parser needs.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
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
  // 16g default: the bench suite (80+ queries x 4 passes, 32 threads,
  // one JVM) saw roving multi-second full-GC outliers at 8g — one
  // query per round absorbed a ~5s pause (q61 in r3, q76 in r4).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
