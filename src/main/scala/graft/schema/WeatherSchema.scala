package graft.schema

import org.apache.spark.sql.types._

/** Canonical schemas for the weather-telemetry domain.
  *
  * Wire shape mirrors the reference's Kafka JSON
  * (ref: Weather-Station/.../WeatherStation.java:127-136,
  * Open-Meteo/.../WeatherMessage.java:5-14); archive shape mirrors the
  * Avro/Parquet schema (ref: Base-Central-Station/.../WeatherStatus.avsc:1-26)
  * and the reference's own Spark StructType
  * (ref: ElasticSearch/.../SparkParquetStreamingToElasticsearch.java:62-74).
  */
object WeatherSchema {

  /** Closed battery enum (ref: WeatherStatus.avsc:7-11). */
  val BatteryStates: Seq[String] = Seq("low", "medium", "high")

  /** Wire (Kafka JSON) schema — camelCase, epoch-millis long timestamp. */
  val wire: StructType = StructType(Seq(
    StructField("stationId", LongType, nullable = false),
    StructField("sequenceNumber", LongType, nullable = false),
    StructField("batteryStatus", StringType, nullable = false),
    StructField("statusTimestamp", LongType, nullable = false),
    StructField("weather", StructType(Seq(
      StructField("humidity", IntegerType),
      StructField("temperature", IntegerType),
      StructField("wind_speed", IntegerType)
    )), nullable = false)
  ))

  /** Archive (Parquet lake) schema — snake_case, proper TimestampType. */
  val archive: StructType = StructType(Seq(
    StructField("station_id", LongType, nullable = false),
    StructField("s_no", LongType, nullable = false),
    StructField("battery_status", StringType, nullable = false),
    StructField("status_timestamp", TimestampType, nullable = false),
    StructField("weather", StructType(Seq(
      StructField("humidity", IntegerType),
      StructField("temperature", IntegerType),
      StructField("wind_speed", IntegerType)
    )), nullable = false)
  ))
}

/** Typed twins for Dataset[T] use where compile-time field checks help. */
case class WeatherReading(humidity: Int, temperature: Int, wind_speed: Int)

case class WeatherMessage(
    stationId: Long,
    sequenceNumber: Long,
    batteryStatus: String,
    statusTimestamp: Long,
    weather: WeatherReading)

case class WeatherStatus(
    station_id: Long,
    s_no: Long,
    battery_status: String,
    status_timestamp: java.sql.Timestamp,
    weather: WeatherReading)
