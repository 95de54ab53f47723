ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "orchestratedetlspark"
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
// Forked runs inherit sbt's stdout directly instead of being pumped
// through sbt's logger (which prefixed every line with [info] and —
// worse — silently dropped the bench's final JSON line when sbt itself
// was SIGTERM'd by the driver's timeout while the fork survived as an
// orphan (BENCH_r02 rc=124, parsed=null). With StdoutOutput the fork's
// writes land on the driver-captured pipe even if sbt is already dead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time: ..." epilogue: the driver parses the bench
// JSON out of the last 2000 chars of output, and every trailing sbt
// line eats that budget (round 3's line was pushed out — parsed: null).
ThisBuild / showSuccess := false
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
  // 8g is ample for sf0.1 (A/B'd vs 24g: no win). Run-to-run bench
  // variance observed on this box traces to transient host contention,
  // not heap pressure — best observed full bench: 51 queries in 55 s.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
