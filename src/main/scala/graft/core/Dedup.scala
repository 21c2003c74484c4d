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
    * reproducible (oracle comparison, idempotent backfills). The ordering
    * struct carries the FULL payload after the event time: duplicates that
    * share (identity, status_timestamp) but differ in payload (a producer
    * re-send with a corrected reading) would otherwise resolve to whichever
    * row the aggregation encountered first — run-dependent, not
    * reproducible.
    */
  def deterministic(archive: DataFrame): DataFrame =
    archive
      .groupBy(col("station_id"), col("s_no"))
      .agg(max_by(
        struct(col("battery_status"), col("status_timestamp"), col("weather")),
        struct(col("status_timestamp"), col("battery_status"), col("weather")))
        .as("r"))
      .select(col("station_id"), col("s_no"),
        col("r.battery_status").as("battery_status"),
        col("r.status_timestamp").as("status_timestamp"),
        col("r.weather").as("weather"))

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * keys state on the identity columns only and EVICTS each key once the
    * watermark passes its first-seen event time + delay — a replay inside
    * the window is a state hit, one after it is late data; both drop.
    * (A plain `dropDuplicates` on a key subset that excludes the
    * event-time column never evicts anything — Spark only prunes dedup
    * state when the watermarked column is part of the key — so that form
    * grows state with every key ever seen: the unbounded-state trap
    * [[graft.streaming.StateGuard]] exists to catch.)
    */
  def streaming(archive: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    archive
      .withWatermark("status_timestamp", watermarkDelay)
      .dropDuplicatesWithinWatermark("station_id", "s_no")
}
