package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming aggregation surface beyond the reference (which has none,
  * SURVEY §2.6 — "windows: none"): watermarked tumbling/sliding windows and
  * stateful edge-triggered alerting. These are the operators a telemetry
  * deployment asks for the day after the latest-value store works.
  */
object WindowedStats {

  /** Watermarked tumbling-window aggregate per station: count/avg/max of a
    * nested reading over event time. Late rows beyond `watermark` are
    * dropped and state for closed windows is evicted — bounded state at any
    * scale (the batch twin is SparkEntry's q12_tumbling_window).
    */
  def tumbling(archive: DataFrame, window_ : String = "15 minutes",
      watermark: String = "30 minutes"): DataFrame =
    archive
      .withWatermark("status_timestamp", watermark)
      .groupBy(window(col("status_timestamp"), window_).as("w"),
        col("station_id"))
      .agg(count(lit(1)).as("n"),
        avg(col("weather.humidity")).as("avg_humidity"),
        max(col("weather.wind_speed")).as("max_wind"))
      .select(col("w.start").as("window_start"), col("station_id"),
        col("n"), col("avg_humidity"), col("max_wind"))

  /** Sliding-window variant (overlapping windows). */
  def sliding(archive: DataFrame, window_ : String = "15 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    archive
      .withWatermark("status_timestamp", watermark)
      .groupBy(window(col("status_timestamp"), window_, slide).as("w"),
        col("station_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("station_id"), col("n"))

  case class AlertState(inAlert: Boolean)
  case class EdgeAlert(station_id: Long, s_no: Long, humidity: Int)

  // not `private`: encoder codegen needs public accessors on the case class
  case class Reading(station_id: Long, s_no: Long, humidity: Int)

  /** Edge-triggered alerting via flatMapGroupsWithState: emit only when a
    * station CROSSES the humidity threshold (rising edge), not on every
    * high reading — the stateful refinement of the reference's stateless
    * Rain-Detector (which re-alerts every message,
    * ref: Rain-Detector/Main.java:34-46). State is one boolean per station.
    */
  def risingEdgeAlerts(archive: DataFrame, threshold: Int = 70): Dataset[EdgeAlert] = {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val encR = Encoders.product[Reading]
    implicit val encA = Encoders.product[EdgeAlert]
    implicit val encS = Encoders.product[AlertState]
    implicit val encLong = Encoders.scalaLong
    archive
      .select(col("station_id"), col("s_no"),
        col("weather.humidity").as("humidity"))
      .as[Reading]
      .groupByKey(_.station_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Reading], state: GroupState[AlertState]) =>
          var inAlert = state.getOption.exists(_.inAlert)
          val out = rows.toSeq.sortBy(_.s_no).flatMap { r =>
            val high = r.humidity > threshold
            val fire = high && !inAlert
            inAlert = high
            if (fire) Some(EdgeAlert(r.station_id, r.s_no, r.humidity)) else None
          }
          state.update(AlertState(inAlert))
          out.iterator
      }
  }
}
