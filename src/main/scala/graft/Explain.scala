package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `sbt "runMain graft.Explain <queryName> [sfDir]"` prints
  * the formatted physical plan for any SparkEntry query — the feedback loop
  * for shuffle/pushdown/codegen auditing.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.register(spark)
    GraftSession.installOptimizations(spark)
    SparkEntry.queries.get(name) match {
      case Some(q) => q(spark, dir).explain("formatted")
      case None =>
        System.err.println(
          s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    spark.stop()
  }
}
