package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.core.{Alerts, LatestState, Normalize}
import graft.lake.Archive

/** The reference's full topology (SURVEY §3.1) as Structured Streaming:
  *
  *   source (kafka | generated | files) → parse → normalize →
  *     fork: (a) latest-per-station state  → in-memory serving table
  *           (b) partitioned parquet lake  → checkpointed file sink
  *           (c) humidity alerts           → alert sink (kafka | memory)
  *
  * Forks run as independent queries over the same declarative source frame —
  * Spark's equivalent of the reference's thread handoffs
  * (CentralStation.java:61-77 + ParquetArchiver worker + Rain-Detector app).
  * Each query has its own checkpoint → independent recovery, like the
  * reference's separate processes, but with exactly-once file-sink semantics
  * instead of the volatile queue (ParquetArchiver.java:36).
  */
object WeatherPipeline {

  /** Kafka wire source (S4) — (key, value) strings on `weather-data`
    * (ref: CentralStation.java:58-59). Untested here (no broker in this
    * environment); the parse/normalize stages are source-agnostic and tested
    * via the generated + file sources.
    */
  def kafkaSource(spark: SparkSession, servers: String,
      topic: String = "weather-data"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")

  /** Kafka alert sink (K3) — the raining-alerts topic. */
  def kafkaAlertSink(alerts: DataFrame, servers: String, checkpoint: String,
      topic: String = "raining-alerts"): StreamingQuery =
    alerts.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Wire JSON stream → canonical archive columns. */
  def normalize(wireJson: DataFrame): DataFrame =
    Normalize.toArchive(Normalize.parseWire(wireJson))

  /** Fork (a): latest-value state, served from an in-memory table named
    * `tableName` (the BitCask + Javalin replacement: query it with
    * `spark.table(tableName)` / SQL).
    */
  def startLatest(archive: DataFrame, tableName: String): StreamingQuery =
    LatestState.latestStream(archive)
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(tableName)
      .start()

  /** Fork (b): the partitioned lake. */
  def startArchive(archive: DataFrame, path: String, checkpoint: String,
      triggerMs: Long = 1000L): StreamingQuery =
    Archive.writeStream(archive, path, checkpoint, triggerMs).start()

  /** Fork (c): alerts to an in-memory sink (kafka in production via
    * [[kafkaAlertSink]]).
    */
  def startAlerts(archive: DataFrame, tableName: String): StreamingQuery =
    Alerts.alerts(archive, keyCol = "station_id")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(tableName)
      .start()
}
