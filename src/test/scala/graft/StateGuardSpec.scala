package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StateGuard

/** The streaming state circuit breaker — the r7 failure mode, made loud.
  * A source whose event times all collapse to one instant freezes the
  * watermark (it trails max event time), so watermark-evicted state never
  * drains and grows with the full history. The guard must trip with an
  * attributable message; a healthy drain must pass untouched.
  */
class StateGuardSpec extends SparkSpec {

  private def collapsedStream(n: Int, files: Int) = {
    val stage = tmpDir("guard_src")
    spark.range(n).select(col("id"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
      .repartition(files).write.mode("overwrite").parquet(stage)
    spark.readStream
      .schema("id BIGINT, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .withWatermark("ts", "10 seconds")
      // every key distinct + one shared event time: state rows grow by
      // n/files per batch and the watermark never passes them
      .dropDuplicates("id", "ts")
  }

  private def drain(df: org.apache.spark.sql.DataFrame, name: String,
      cap: Long): Unit = {
    val guard = new StateGuard(spark, cap).install()
    try {
      val q = df.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation", tmpDir("guard_ck"))
        .trigger(Trigger.AvailableNow()).start()
      try {
        q.awaitTermination()
        guard.assertClean(q)
        StateGuard.audit(q, cap)
      } finally {
        if (q.isActive) q.stop()
        spark.catalog.dropTempView(name)
      }
    } finally guard.uninstall()
  }

  test("collapsed event times trip the breaker with an attributable error") {
    val e = intercept[IllegalStateException] {
      drain(collapsedStream(n = 500, files = 4), "guard_trip", cap = 100)
    }
    assert(e.getMessage.contains("circuit breaker"), e.getMessage)
    assert(e.getMessage.contains("state rows"), e.getMessage)
  }

  test("a healthy drain under the cap passes clean") {
    drain(collapsedStream(n = 50, files = 2), "guard_clean", cap = 1000)
  }

  test("the gate drains run guarded: default cap clears every real gate") {
    // the largest real gate state (both sides of a stream-stream join at
    // sf0.1) is ~2e5 rows; the default must clear it by a wide margin so
    // the guard only ever fires on genuine unbounded growth
    assert(StateGuard.DefaultMaxStateRows >= 5L * 1000 * 1000)
  }
}
