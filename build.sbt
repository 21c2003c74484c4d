ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "weathermonitoringspark"
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
// Pass forked-run stdout through unprefixed so Bench's one-line metric
// JSON is machine-parseable from sbt's stdout (it is also written to
// target/bench.json as a belt-and-braces sink).
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
  // 24g default (box has 128 GiB): measured ~5-12% off the full-suite
  // bench vs 8g, with the worst streaming-drain gate dropping from
  // ~10.5 s to ~7.3 s — the suite's long-lived JVM accumulates state
  // stores + memory-sink tables across 220 gates and the extra
  // headroom keeps GC out of the drain floors
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // the session's spark.cleaner.periodicGC (needed so ContextCleaner
  // reclaims dead checkpoint blocks inside one long sweep) calls
  // System.gc(); without this flag that is a stop-the-world full
  // collection on a 24g heap — measured 1-3 s pauses landing inside
  // whichever gate is running. Concurrent G1 cycles give the cleaner
  // the same reclamation signal without the pause.
  "-XX:+ExplicitGCInvokesConcurrent",
)
