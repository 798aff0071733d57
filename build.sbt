ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "samplec360text2sqlsegmentationentityresolutionspark"
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
// Lean startup by default: a huge pre-touched -Xms was measured at ~10 min
// of pre-main page faulting on a loaded host (round-2 artifact timeout).
// Xmx stays large (the test suite's working set needs ~12g+); Xms stays
// small so JVMs start in seconds. Opt into the pre-touched benchmark heap
// with SPARK_GRAFT_BENCH_HEAP=1 for manual steady-state measurements.
javaOptions ++= jdk17AddOpens ++ Seq(
  // G1, not ParallelGC: on this host/kernel ParallelGC's worker threads
  // were measured spinning ~100% CPU outside collections (443 s thread CPU
  // vs 4 s of actual GC), polluting every core; G1 shows no such spin and
  // a 2x faster pure-CPU probe under identical load.
  "-XX:+UseG1GC",
  "-XX:ParallelGCThreads=8", // pinned: GC cost must not vary with local[N] level
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ (
  if (sys.env.get("SPARK_GRAFT_BENCH_HEAP").contains("1"))
    Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}", "-XX:+AlwaysPreTouch")
  else Seq(s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", "2g")}")
)
// Pass the forked process's stdout straight through (no "[info] " prefix):
// the driver parses graft.Bench's one-line JSON from stdout, and a log
// prefix breaks strict JSON parsing of the line.
run / outputStrategy := Some(StdoutOutput)
// Suppress the trailing "[success] Total time: ..." line so the bench JSON
// can be the last line of output.
Global / showSuccess := false
