package graft

import org.apache.spark.sql.SparkSession
import graft.gen.StationSource
import graft.streaming.WeatherPipeline

/** End-to-end streaming throughput benchmark: N wire-JSON messages through
  * the full 3-fork topology (normalize → latest-state + partitioned lake +
  * alerts), reporting rows/sec over the ingest wall time. The reference's
  * design envelope is ~10.33 msg/s (BASELINE.md); this measures how far a
  * single node of the Spark engine exceeds it.
  * `sbt "runMain graft.StreamBench [nMessages] [file|wire]"` — `file`
  * (default) stages the messages as text files first (ingest-bound);
  * `wire` streams them through the DataSourceV2
  * [[graft.sources.WireSourceProvider]] micro-batch source instead, so the
  * number includes the Source-API offset/reader path the Kafka connector
  * exercises (4 admission-paced micro-batches).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(200000)
    val mode = if (args.length > 1) args(1) else "file"
    val nStations = 100
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Scratch.dir, not a bare temp dir: the staged wire text, lake, and
    // checkpoint are deleted at JVM exit instead of stranding in /tmp
    val base = graft.util.Scratch.dir("stream-bench")
    require(total >= nStations && total % nStations == 0,
      s"total=$total must be a positive multiple of $nStations stations — " +
        "integer division would otherwise silently benchmark " +
        s"${total / nStations * nStations} rows while reporting $total")
    val perStation = total / nStations
    val wire =
      if (mode == "wire")
        WeatherPipeline.decodeWire(spark.readStream
          .format(classOf[graft.sources.WireSourceProvider].getName)
          .option("stations", nStations.toString)
          .option("perStation", perStation.toString)
          .option("ticksPerBatch", math.max(1, perStation / 4).toString)
          .load())
      else {
        val srcDir = s"$base/wire"
        StationSource.messagesAsJson(spark, nStations, perStation)
          .select("value").coalesce(8).write.text(srcDir)
        spark.readStream.schema("value STRING").text(srcDir)
      }
    val archive = WeatherPipeline.normalize(wire)

    val t0 = System.nanoTime()
    val qLatest = WeatherPipeline.startLatest(archive, "sb_latest")
    val qLake = WeatherPipeline.startArchive(archive, s"$base/lake", s"$base/ck")
    val qAlerts = WeatherPipeline.startAlerts(archive, "sb_alerts")
    Seq(qLatest, qLake, qAlerts).foreach(_.processAllAvailable())
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(s"$base/lake").count()

    println(f"""{"metric":"stream_rows_per_sec","value":${rows / sec}%.0f,"unit":"rows/sec","rows":$rows,"wall_sec":$sec%.2f,"forks":3,"source":"$mode"}""")
    Seq(qLatest, qLake, qAlerts).foreach(_.stop())
    spark.stop()
  }
}
