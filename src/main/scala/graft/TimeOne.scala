package graft

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock probe: `sbt "runMain graft.TimeOne <name>..."`
  * times each named SparkEntry query at sf0.1 after one warm run —
  * the per-query companion to the full [[Bench]] sweep when iterating on
  * one plan.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // validate before the session starts (same pattern as ShuffleAudit)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    // the shared harness session IS Bench's session, so a TimeOne number
    // predicts the Bench number by construction
    val spark = GraftSession.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      SparkEntry.queries(name)(spark, dir).count()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
