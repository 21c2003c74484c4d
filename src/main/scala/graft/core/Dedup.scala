package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A8 — idempotent-upsert dedup on the `(station_id, s_no)` identity
  * (ref: ES `_id = station_id + "_" + s_no`, ParquetToElasticsearch.java:193,
  * SparkParquetStreamingToElasticsearch.java:131-139).
  */
object Dedup {

  /** Batch dedup. `dropDuplicates` keeps an arbitrary member per group —
    * fine when duplicates are exact replays (the reference's case: re-read
    * files re-index identical docs).
    */
  def exactReplays(archive: DataFrame): DataFrame =
    archive.dropDuplicates("station_id", "s_no")

  /** Deterministic variant: keep the event-time-max row per identity via
    * partial aggregation — use when duplicates may differ and results must be
    * reproducible (oracle comparison, idempotent backfills).
    */
  def deterministic(archive: DataFrame): DataFrame =
    archive
      .groupBy(col("station_id"), col("s_no"))
      .agg(max_by(
        struct(col("battery_status"), col("status_timestamp"), col("weather")),
        col("status_timestamp")).as("r"))
      .select(col("station_id"), col("s_no"),
        col("r.battery_status").as("battery_status"),
        col("r.status_timestamp").as("status_timestamp"),
        col("r.weather").as("weather"))

  /** Streaming dedup: watermark bounds the key state so it doesn't grow
    * forever (the reference's ES-side dedup has unbounded "state" — the index
    * itself; a watermark is the scale-correct equivalent).
    */
  def streaming(archive: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    archive
      .withWatermark("status_timestamp", watermarkDelay)
      .dropDuplicates("station_id", "s_no")
}
