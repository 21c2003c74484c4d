package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Targeted correctness dump: like [[Verify]] but only for the query names
  * given on the command line — `sbt "runMain graft.VerifySome <sfDir>
  * <outDir> <name>..."` — so a changed gate can be oracle-checked locally
  * in seconds instead of re-dumping all of them.
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    // validate BEFORE spinning up the session: a typo'd gate name should
    // list the valid names, not NoSuchElementException mid-loop with
    // earlier dumps written and spark.stop() skipped
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    val spark = GraftSession.harnessSession()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      SparkEntry.oracleSql.get(name).foreach(sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"), sql))
    }
    spark.stop()
  }
}
