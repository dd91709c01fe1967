ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "logagentspark"
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
// The driver parses the LAST stdout line of `runMain graft.Bench` as
// JSON; sbt's "[success] Total time ..." epilogue after the forked
// run's output broke that parse two rounds running (r12/r13 driver
// artifacts came back `parsed: null`). Suppress the epilogue so the
// bench's JSON line is the guaranteed last line; the same line is
// also mirrored to ./bench.json by Bench itself.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Pass the forked run's stdout through VERBATIM (no "[info] " prefix):
// the driver parses runMain output as raw JSON lines; the r13 artifact
// shows it keeps only a ~2000-char stdout tail, so the mirrors
// (bench.json, verify_summary.json) remain the durable record either
// way, but an unprefixed final line gives a line-based parser its best
// shot.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
