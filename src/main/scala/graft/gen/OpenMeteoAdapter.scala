package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3 — the REST channel-adapter analog: parse an Open-Meteo
  * current-weather API response and adapt it into the wire WeatherMessage
  * shape (ref: Open-Meteo/.../WeatherDataFetcher.java:17-59 parse+round,
  * OpenMeteoChannelAdapter.java:19-31 adapt).
  *
  * The HTTP GET itself is environment I/O, not an engine operator — in
  * production a small driver-side poller (or a Kafka connector) lands raw
  * response strings; this adapter is the pure, distributed row map the
  * reference runs in `adaptMessage`. Temperature/wind arrive as doubles and
  * are rounded to int (T11); humidity is already integral. `statusTimestamp`
  * is second-granular epoch millis like the reference
  * (`toEpochSecond()*1000`, OpenMeteoChannelAdapter.java:20).
  */
object OpenMeteoAdapter {

  /** Schema of the API response subset the reference reads. */
  val responseSchema: StructType = StructType(Seq(
    StructField("current", StructType(Seq(
      StructField("temperature_2m", DoubleType),
      StructField("relative_humidity_2m", IntegerType),
      StructField("wind_speed_10m", DoubleType))))))

  /** raw response string column + station/seq/timestamp columns →
    * wire-format WeatherMessage rows. Unparseable responses are dropped
    * (the reference returns null and skips, WeatherDataProducer.java:33-38).
    */
  def adapt(raw: DataFrame, responseCol: String = "response",
      stationIdCol: String = "stationId", seqCol: String = "sequenceNumber",
      epochSecCol: String = "epochSec"): DataFrame =
    raw
      .withColumn("r", from_json(col(responseCol), responseSchema))
      .filter(col("r").isNotNull && col("r.current").isNotNull)
      .select(
        col(stationIdCol).cast(LongType).as("stationId"),
        col(seqCol).cast(LongType).as("sequenceNumber"),
        // same 30/40/30 battery draw as the station generator, derived
        // deterministically from (station, seq) — two separate rand()
        // expressions would draw independently per `when` branch (skewing
        // to ~30/49/21) and re-roll on task retry
        // (ref: OpenMeteoChannelAdapter.java:12-17)
        {
          val r = (pmod(xxhash64(col(stationIdCol), col(seqCol), lit(42L)),
            lit(1000000L)).cast(DoubleType) / 1000000.0)
          when(r < 0.3, "low").when(r < 0.7, "medium").otherwise("high")
        }.as("batteryStatus"),
        (col(epochSecCol).cast(LongType) * 1000L).as("statusTimestamp"),
        struct(
          col("r.current.relative_humidity_2m").as("humidity"),
          round(col("r.current.temperature_2m"), 0).cast(IntegerType)
            .as("temperature"),
          round(col("r.current.wind_speed_10m"), 0).cast(IntegerType)
            .as("wind_speed")).as("weather"))
}
