ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tibameprojectspark"
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
// The container's locale is POSIX, under which the JVM's JNI-layer
// filename encoding (sun.jnu.encoding) is ASCII — java.io silently
// fails to resolve any path with non-ASCII characters (e.g. the
// reference's real fb_scraper blobs). -Dsun.jnu.encoding is ignored on
// JDK 17 (fixed at VM init from the locale), so the fix is the locale
// itself on the forked JVMs.
Test / envVars += "LC_ALL" -> "C.UTF-8"
run / envVars += "LC_ALL" -> "C.UTF-8"
// The bench/verify driver contract needs the forked main's stdout
// verbatim: sbt's default LoggedOutput re-frames every forked line as
// "[info] ..." which defeats the driver's JSON-line parser
// (BENCH_r02.json parsed:null). StdoutOutput passes the child's
// stdout/stderr straight through, and showSuccess drops the trailing
// "[success] Total time ..." line so the bench JSON is genuinely the
// last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
scalacOptions += "-deprecation"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
