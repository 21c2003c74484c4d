package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.WeatherSchema

/** S1/S2 — synthetic station source with lossy-channel semantics.
  *
  * Reproduces the reference's generator distributions
  * (ref: WeatherStation.java:95-125): humidity 10–100, temperature 32–110 °F,
  * wind 0–60, battery low/medium/high at 30/40/30, per-station monotonic
  * sequence numbers, second-granular epoch-millis timestamps — and the 10%
  * pre-send drop that happens AFTER sequence increment
  * (ref: WeatherStation.java:47-52), so surviving rows show sequence gaps.
  *
  * Everything is column expressions over a `range`/`rate` relation: the
  * generator itself is distributed (each executor generates its slice), seeded
  * and deterministic in batch mode. No driver-side loops, no UDFs.
  */
object StationSource {

  /** Deterministic per-row uniform double in [0,1) derived from (seed, id, salt)
    * — xxhash64 is a codegen'd built-in, stable across runs and partitioning.
    */
  /** Uniform [0,1) draw derived DETERMINISTICALLY from a stable row id —
    * one value per (row, salt), so referencing the same draw in chained
    * `when` branches compares against ONE number (a nondeterministic
    * `rand` expression re-evaluates per reference: `when(r<0.3).when(
    * r<0.7)` with rand would draw twice, skewing 30/40/30 to ~30/49/21),
    * and a task retry reproduces identical rows.
    */
  private def uOf(idCol: org.apache.spark.sql.Column, seed: Long,
      salt: Int): org.apache.spark.sql.Column =
    (pmod(xxhash64(idCol, lit(seed), lit(salt)), lit(1000000L)).cast("double")
      / 1000000.0)

  private def u(seed: Long, salt: Int): org.apache.spark.sql.Column =
    uOf(col("id"), seed, salt)

  /** Batch generator: `nStations × perStation` wire-format rows starting at
    * `startEpochSec`, one reading per station per second. Drop simulation
    * removes ~dropRate of rows post-sequence-assignment (gap semantics).
    */
  def messages(
      spark: SparkSession,
      nStations: Int,
      perStation: Int,
      startEpochSec: Long = 1700000000L,
      dropRate: Double = 0.1,
      seed: Long = 42L): DataFrame = {

    val base = spark.range(nStations.toLong * perStation)
      .withColumn("stationId", (col("id") % nStations) + 1)
      .withColumn("sequenceNumber", expr(s"id DIV $nStations") + 1)

    val battery = {
      val r = u(seed, 1)
      when(r < 0.3, "low").when(r < 0.7, "medium").otherwise("high")
    }

    base
      .withColumn("batteryStatus", battery)
      .withColumn("statusTimestamp",
        (lit(startEpochSec) + (col("sequenceNumber") - 1)) * 1000L)
      .withColumn("weather", struct(
        (lit(10) + (u(seed, 2) * 91).cast("int")).as("humidity"),
        (lit(32) + (u(seed, 3) * 79).cast("int")).as("temperature"),
        (u(seed, 4) * 61).cast("int").as("wind_speed")))
      // S2: lossy channel — drop AFTER sequence assignment → gaps survive
      .filter(u(seed, 5) >= dropRate)
      .select("stationId", "sequenceNumber", "batteryStatus",
        "statusTimestamp", "weather")
  }

  /** The same rows as wire JSON strings keyed by station — the exact Kafka
    * (key, value) layout (ref: WeatherStation.java:56-62). Feed this to a
    * kafka sink, or use it to exercise the JSON-parse path end-to-end.
    */
  def messagesAsJson(
      spark: SparkSession,
      nStations: Int,
      perStation: Int,
      startEpochSec: Long = 1700000000L,
      dropRate: Double = 0.1,
      seed: Long = 42L): DataFrame =
    messages(spark, nStations, perStation, startEpochSec, dropRate, seed)
      .select(
        col("stationId").cast("string").as("key"),
        to_json(struct(col("stationId"), col("sequenceNumber"),
          col("batteryStatus"), col("statusTimestamp"), col("weather")))
          .as("value"))

  /** Streaming generator: rate source at `rowsPerSecond`, same column
    * pipeline — 1 row/s/station parity comes from rowsPerSecond = nStations
    * (ref: WeatherStation.java:77 cadence). Sequence = rate source's
    * monotonic `value` per station; timestamps are event time from the rate
    * clock. All draws hash the rate source's `value` — a STABLE row
    * identity — so the stream realizes the exact 30/40/30 battery split
    * and drop rate the batch generator does, and a micro-batch replayed
    * after a task retry reproduces identical rows (a `rand`-based draw
    * would re-roll on retry AND double-draw in the chained battery
    * `when`, skewing the split to ~30/49/21).
    */
  def messageStream(
      spark: SparkSession,
      nStations: Int,
      rowsPerSecond: Int,
      dropRate: Double = 0.1,
      seed: Long = 42L): DataFrame = {
    val v = col("value")
    val battery = {
      val r = uOf(v, seed, 1)
      when(r < 0.3, "low").when(r < 0.7, "medium").otherwise("high")
    }
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .withColumn("stationId", (col("value") % nStations) + 1)
      .withColumn("sequenceNumber", expr(s"value DIV $nStations") + 1)
      .withColumn("batteryStatus", battery)
      .withColumn("statusTimestamp",
        (unix_timestamp(col("timestamp"))) * 1000L)
      .withColumn("weather", struct(
        (lit(10) + (uOf(v, seed, 2) * 91).cast("int")).as("humidity"),
        (lit(32) + (uOf(v, seed, 3) * 79).cast("int")).as("temperature"),
        (uOf(v, seed, 4) * 61).cast("int").as("wind_speed")))
      .filter(uOf(v, seed, 5) >= dropRate)
      .select("stationId", "sequenceNumber", "batteryStatus",
        "statusTimestamp", "weather")
  }
}
