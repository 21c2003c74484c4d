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
    // fail BEFORE the session for a typo'd name, and with exit 1 so a
    // scripted plan audit can't mistake the miss for a pass
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(
        s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
    // the harness session, not a hand-rolled config: the printed plan must
    // audit exactly the session Verify/Bench run (GraftSession's doc calls
    // out that any drift makes targeted plan auditing silently meaningless)
    val spark = GraftSession.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
