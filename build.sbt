ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metricsadvisorspark"
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
// Forked-run stdout goes through sbt's logger by default, which
// prefixes every line with "[info] " — that prefix is why none of the
// driver's BENCH_r{1..8} artifacts ever parsed the Bench JSON line
// (the tail shows `[info] {"metric":...}`; a line-oriented JSON parse
// fails on the prefix). StdoutOutput passes the child's stdout through
// verbatim.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // keep the heap small AND fixed: on this microVM a large Xmx lets the
  // JVM grow into cold overcommitted host pages instead of GCing —
  // measured 65 s vs 250 s for the same bench at 8g vs 48g. Xms = Xmx
  // so GC reuses warm pages rather than expanding mid-query.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // fault the whole fixed heap in at JVM start: on this microVM the
  // host backs guest pages lazily, and first-touch faults during the
  // timed bench section showed up as minutes of 3-12x inflation on the
  // alphabetically-first queries (r12 measurement). Pre-touching moves
  // that one-time cost before main() — outside every timed region.
  "-XX:+AlwaysPreTouch",
)
