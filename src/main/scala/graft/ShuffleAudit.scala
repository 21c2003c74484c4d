package graft

import java.util.concurrent.atomic.LongAdder

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
    val bytes = new LongAdder
    val records = new LongAdder
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.add(m.shuffleWriteMetrics.bytesWritten)
        records.add(m.shuffleWriteMetrics.recordsWritten)
      }
    }
  }

  /** Run one registered gate warm and return
    * (result rows, shuffle bytes written, shuffle records written).
    */
  def audit(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): (Long, Long, Long) = {
    SparkEntry.queries(name)(spark, dir).count() // warm
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    val rows = SparkEntry.queries(name)(spark, dir).count()
    // listener events arrive asynchronously (the bus's drain method is
    // private[spark]); poll until two consecutive reads agree
    var prev = -1L
    var settled = tally.bytes.sum() + tally.records.sum()
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (settled != prev && System.nanoTime() < deadline) {
      prev = settled
      Thread.sleep(100)
      settled = tally.bytes.sum() + tally.records.sum()
    }
    spark.sparkContext.removeSparkListener(tally)
    (rows, tally.bytes.sum(), tally.records.sum())
  }

  def main(args: Array[String]): Unit = {
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
