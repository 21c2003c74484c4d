package graft

import org.apache.spark.sql.functions._
import graft.core.Normalize
import graft.gen.StationSource
import graft.lake.Archive
import graft.streaming.WeatherPipeline

class RecoverySpec extends SparkSpec {

  test("archive stream restarts from checkpoint without duplicating rows") {
    val srcDir = tmpDir("src"); val lakeDir = tmpDir("lake") + "/lake"
    val ckpt = tmpDir("ck")

    def stage(batch: Int): Unit =
      StationSource.messagesAsJson(spark, nStations = 3, perStation = 20,
        startEpochSec = 1700000000L + batch * 1000)
        .select("value").coalesce(1).write.mode("append").text(srcDir)

    def startQuery() = {
      val wire = spark.readStream.schema("value STRING").text(srcDir)
      WeatherPipeline.startArchive(
        WeatherPipeline.normalize(wire), lakeDir, ckpt)
    }

    stage(0)
    val q1 = startQuery()
    q1.processAllAvailable()
    val afterFirst = spark.read.parquet(lakeDir).count()
    q1.stop() // "crash"

    stage(1) // new data arrives while down
    val q2 = startQuery() // recover from the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    val lake = spark.read.parquet(lakeDir)
    val batchOracle = WeatherPipeline.normalize(spark.read.text(srcDir))
    // exactly-once: every input row exactly once, no re-processing of batch 0
    assert(lake.count() == batchOracle.count())
    assert(lake.count() > afterFirst)
    // both staged batches reuse s_no 1..20, so row identity here includes
    // the event timestamp (distinct per staging)
    assert(lake.groupBy("station_id", "s_no", "status_timestamp").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("latest-state stream runs on the RocksDB state store provider") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.schema.{WeatherReading, WeatherStatus}
    implicit val sq = spark.sqlContext
    import spark.implicits._

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[WeatherStatus]
    val q = graft.core.LatestState.latestStream(input.toDF())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("rocksdb_latest").start()
    try {
      input.addData(WeatherStatus(1L, 1L, "low",
        new java.sql.Timestamp(1000L), WeatherReading(50, 70, 5)))
      q.processAllAvailable()
      input.addData(WeatherStatus(1L, 2L, "high",
        new java.sql.Timestamp(2000L), WeatherReading(60, 71, 6)))
      q.processAllAvailable()
      val rows = spark.table("rocksdb_latest").collect()
      assert(rows.last.getAs[Long]("s_no") == 2L) // state survived across batches
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
