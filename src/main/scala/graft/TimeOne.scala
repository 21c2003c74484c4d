package graft

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock probe: `sbt "runMain graft.TimeOne <name>..."`
  * times each named SparkEntry query at sf0.1 after one warm run —
  * the per-query companion to the full [[Bench]] sweep when iterating on
  * one plan.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // mirror Bench's session exactly (cpus env, function registry,
    // optimizer rules) so a TimeOne number predicts the Bench number
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.register(spark)
    GraftSession.installOptimizations(spark)
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
