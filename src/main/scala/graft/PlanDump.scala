package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Batch plan capture: `sbt "runMain graft.PlanDump <outDir> [suffix] [name...]"`
  * writes `<outDir>/<query><suffix>.txt` with the `explain("formatted")`
  * output of every named SparkEntry query (all of them when no names are
  * given) — the audit artifact the optimization rounds commit under
  * `plans/` so plan-shape claims (Exchange count, join strategy,
  * PushedFilters, codegen spans) are checkable without running Spark.
  *
  * Planning only — no query is executed, so a full 231-gate dump runs in
  * about a minute. Queries whose builder itself runs jobs (staging
  * fixtures, training passes) still pay that staging once, same as any
  * Explain invocation.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val suffix = if (args.length > 1) args(1) else "_before"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    val spark = GraftSession.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get(outDir))
    var failed = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        // queryExecution.explainString is explain("formatted") without
        // the console print, so the artifact file is exactly the
        // deliverable format
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"$name$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    println(s"[plandump] wrote ${names.length - failed} plans to $outDir" +
      (if (failed > 0) s" ($failed failed)" else ""))
    spark.stop()
    // a scripted plan-audit step must see partial artifacts as a failure,
    // not silently proceed on an incomplete dump
    if (failed > 0) sys.exit(1)
  }
}
