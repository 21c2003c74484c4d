package graft

import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Measured-shuffle probe: `sbt "runMain graft.ShuffleAudit <name>..."`
  * runs each named SparkEntry query at `SPARK_GRAFT_SF_DIR` (default
  * sf0.1) and prints the bytes and records every shuffle stage wrote —
  * the quantitative backing for SCALE.md's "shuffles carry 8-byte keys"
  * claims. A stage-completion listener sums `shuffleWriteMetrics`
  * across the job, so the number is what the exchange actually
  * serialized, not a plan-reading estimate. Each query runs once warm
  * (JIT + page cache) before the measured run, mirroring [[TimeOne]].
  */
object ShuffleAudit {

  private final class Tally extends SparkListener {
    // keyed by stageId, keeping the LATEST attempt's metrics: a
    // failed-then-retried stage fires onStageCompleted once per ATTEMPT,
    // and summing both would double-count the retried shuffle writes —
    // inflating the numbers SCALE.md's claims rest on
    private val byStage =
      new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        val entry = (sc.stageInfo.attemptNumber,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleWriteMetrics.recordsWritten)
        byStage.merge(sc.stageInfo.stageId, entry,
          (old, nw) => if (nw._1 >= old._1) nw else old)
      }
    }
    def bytesSum: Long = {
      var t = 0L; byStage.values.forEach(v => t += v._2); t
    }
    def recordsSum: Long = {
      var t = 0L; byStage.values.forEach(v => t += v._3); t
    }
  }

  /** Run one registered gate warm and return
    * (result rows, shuffle bytes written, shuffle records written).
    *
    * Two measurement traps are handled explicitly. The run executes via
    * `queryExecution.toRdd` — a `count()` on top would let Catalyst prune
    * columns through the final aggregate and understate the bytes the
    * gate's real output shuffles. And the listener bus is drained (a true
    * barrier, not a sleep-poll) both before attaching — so the warm run's
    * still-queued stage events cannot leak into the tally — and after the
    * measured run, so every stage event has arrived before reading it.
    */
  def audit(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): (Long, Long, Long) = {
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name'; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count() // warm
    GraftListenerBridge.drain(spark.sparkContext)
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    try {
      val rows =
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      GraftListenerBridge.drain(spark.sparkContext)
      (rows, tally.bytesSum, tally.recordsSum)
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  def main(args: Array[String]): Unit = {
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    val spark = GraftSession.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val (rows, b, r) = audit(spark, dir, name)
      val per = if (r > 0) f"${b.toDouble / r}%.1f" else "-"
      println(f"$name: rows=$rows shuffle_bytes=$b shuffle_records=$r " +
        s"bytes_per_record=$per")
    }
    spark.stop()
  }
}
