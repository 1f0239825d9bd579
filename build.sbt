ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mainframedatamigrationspark"
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
// Pass the forked JVM's stdout/stderr through UNPREFIXED: sbt's default
// logger strategy prepends "[info] " to every forked stdout line, which is
// exactly why the round-1 driver bench emitted a JSON line that nothing
// could parse. With StdoutOutput the bench's bare JSON line reaches the
// caller verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// local-cluster (executor-mode benchmarking) launches executor JVMs through
// the in-process standalone Worker, which resolves the launch command via
// these env vars; without them executor launch fails and the master removes
// the app ("Master removed our application: FAILED")
run / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13")
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13")
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // fixed-size, pre-touched heap with transparent hugepages: heap-growth
  // page faults against the hypervisor were a measured multi-threaded
  // allocation bottleneck in this sandbox (see BENCH.md notes)
  "-XX:+UseG1GC", "-XX:+AlwaysPreTouch", "-XX:+UseTransparentHugePages",
)
