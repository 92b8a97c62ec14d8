ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "incubatoricebergspark"
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
// The bench's one-line JSON contract: sbt's default LoggedOutput prefixes
// forked-run stdout with "[info] ", which made the driver's parser reject
// the {"metric":"total",...} line in EVERY round so far (BENCH_r01..r13 all
// carry parsed:null). StdoutOutput passes the child's stdout through
// verbatim. Bench also writes the same JSON to BENCH_LAST.json as a second
// channel no capture window can lose.
run / outputStrategy := Some(StdoutOutput)
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
  // Pin the heap: without -Xms the heap grows lazily and G1 uncommits
  // regions after full GCs, so measurement samples intermittently eat
  // multi-second page-fault storms INSIDE young-GC pauses when the heap
  // re-expands (measured: a single 3.4 s young collection during a
  // 24 G -> 49 G growth step — the llm_cc_dedup bench bimodality).
  // Committing (and pre-touching) the whole heap at JVM start moves that
  // cost out of every timed region once and for all.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
