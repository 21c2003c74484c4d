package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.WeatherSchema

/** T1–T11 — the wire→archive column pipeline.
  *
  * All steps are narrow, codegen'd projections/filters: parse, rename
  * camelCase→snake_case, epoch-millis→timestamp, enum validation, calendar
  * extraction for partition keys (ref: CentralStation.java:91-120,
  * ParquetArchiver.java:122-143). Zero shuffles; everything fuses into one
  * WholeStageCodegen stage over the source.
  */
object Normalize {

  /** T1 — parse a `value` column of wire JSON with PERMISSIVE-drop semantics:
    * malformed rows parse to null and are filtered, mirroring the reference's
    * catch-log-skip (ref: Rain-Detector/Main.java:41-44,
    * CentralStation.java:74-76).
    */
  def parseWire(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw
      .withColumn("msg", from_json(col(jsonCol), WeatherSchema.wire))
      .filter(col("msg").isNotNull && col("msg.stationId").isNotNull)
      .select("msg.*")

  /** T4+T5+T7 — wire columns → canonical archive columns.
    * Invalid battery enum values are rejected (CHECK-constraint semantics,
    * ref: WeatherStatus.avsc:7-11 enum).
    */
  def toArchive(wire: DataFrame): DataFrame =
    wire
      .withColumn("battery_status", lower(col("batteryStatus")))
      .filter(col("battery_status").isin(WeatherSchema.BatteryStates: _*))
      .select(
        col("stationId").as("station_id"),
        col("sequenceNumber").as("s_no"),
        col("battery_status"),
        timestamp_millis(col("statusTimestamp")).as("status_timestamp"),
        col("weather"))

  /** T5 — derive hive partition keys from event time (UTC; the reference used
    * system TZ — documented divergence, SURVEY §7.4).
    */
  def withPartitionKeys(archive: DataFrame): DataFrame =
    archive
      .withColumn("date", date_format(col("status_timestamp"), "yyyy-MM-dd"))
      .withColumn("hour", hour(col("status_timestamp")))

  /** T6 — ISO-8601 string rendering of the event timestamp (for index docs,
    * ref: SparkParquetStreamingToElasticsearch.java:104-117).
    */
  def isoTimestamp(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSX")

  /** T8/T9 — archive row → indexable JSON document with deterministic doc id
    * `station_id_s_no` (idempotent-upsert key,
    * ref: ParquetToElasticsearch.java:193).
    */
  def toIndexDocs(archive: DataFrame): DataFrame =
    archive.select(
      concat(col("station_id"), lit("_"), col("s_no")).as("doc_id"),
      to_json(struct(
        col("station_id"), col("s_no"),
        // already lower-cased and enum-validated by toArchive — no
        // re-normalization on the indexing path
        col("battery_status"),
        isoTimestamp(col("status_timestamp")).as("status_timestamp"),
        col("weather"))).as("doc"))
}
