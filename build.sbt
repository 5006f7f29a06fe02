ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cgalogstokinesisspark"
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
// The driver's bench/verify capture keeps the LAST ~2,000 chars of stdout
// and json-parses the final line. Two sbt behaviors defeated that in
// rounds 1-5 (BENCH_r0*.json all have parsed:null): LoggedOutput prefixes
// every forked-process line with "[info] ", and "[success] Total time..."
// trails the contract line. StdoutOutput pipes the forked JVM's stdio raw
// (stdout unprefixed, stderr on real stderr), and showSuccess drops the
// trailing summary — the contract line becomes stdout's last line.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] with wide decimal aggregations needs headroom: 8g GC-thrashes
  // (measured 2.5s -> 24s run-to-run swings on q20); the box has 125g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
