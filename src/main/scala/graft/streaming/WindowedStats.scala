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

  case class AlertState(inAlert: Boolean, lastSno: Long)
  case class EdgeAlert(station_id: Long, s_no: Long, humidity: Int)

  // not `private`: encoder codegen needs public accessors on the case class
  case class Reading(station_id: Long, s_no: Long, humidity: Int)

  /** Edge-triggered alerting via flatMapGroupsWithState: emit only when a
    * station CROSSES the humidity threshold (rising edge), not on every
    * high reading — the stateful refinement of the reference's stateless
    * Rain-Detector (which re-alerts every message,
    * ref: Rain-Detector/Main.java:34-46). State per station is the alert
    * boolean plus a HIGH-WATER s_no: rows are applied in s_no order within
    * a batch, and a row older than the high-water (an out-of-order arrival
    * in a LATER micro-batch) is ignored — without it, a stale low reading
    * would regress the boolean and the next high reading would fire a
    * duplicate alert for one continuous episode.
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
          val st = state.getOption.getOrElse(AlertState(false, Long.MinValue))
          var inAlert = st.inAlert
          var highWater = st.lastSno
          val out = rows.toSeq.sortBy(_.s_no).flatMap { r =>
            if (r.s_no <= highWater) None // stale arrival: newer already applied
            else {
              highWater = r.s_no
              val high = r.humidity > threshold
              val fire = high && !inAlert
              inAlert = high
              if (fire) Some(EdgeAlert(r.station_id, r.s_no, r.humidity))
              else None
            }
          }
          state.update(AlertState(inAlert, highWater))
          out.iterator
      }
  }

  // public (not nested/private) for encoder codegen, same as Reading
  case class Ping(station_id: Long, s_no: Long, ts: java.sql.Timestamp)
  case class SeenState(sNo: Long, tsMicros: Long)
  case class OfflineAlert(station_id: Long, last_s_no: Long,
      last_seen: java.sql.Timestamp)

  /** Offline-station detection via an EVENT-TIME TIMER
    * (`GroupStateTimeout.EventTimeTimeout`) — the stateful-processing
    * feature none of the other operators exercise: per station, keep the
    * latest (event-time, s_no) ping and arm a timer at `last_seen +
    * quiet`; each newer ping re-arms it. When the WATERMARK passes the
    * armed time with no newer ping, the group times out and emits one
    * OfflineAlert carrying the station's final state, then drops its
    * state. The reference's serving layer can only answer "latest value
    * when asked" (BitCask.java:143-168); this is its push-based
    * complement, and the timer's state is O(1) per station forever.
    *
    * Input needs columns (station_id, s_no, ts); the caller's watermark
    * delay governs how late a reviving ping may arrive before the alert
    * is considered final.
    */
  def offlineAlerts(pings: DataFrame, quietMs: Long = 24L * 3600 * 1000,
      watermark: String = "30 minutes"): Dataset[OfflineAlert] = {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val encP = Encoders.product[Ping]
    implicit val encS = Encoders.product[SeenState]
    implicit val encO = Encoders.product[OfflineAlert]
    implicit val encLong = Encoders.scalaLong
    def micros(t: java.sql.Timestamp): Long = graft.util.Micros.fromTimestamp(t)
    pings
      .select(col("station_id"), col("s_no"), col("ts"))
      .withWatermark("ts", watermark)
      .as[Ping]
      .groupByKey(_.station_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (station: Long, rows: Iterator[Ping], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(OfflineAlert(station, s.sNo,
              graft.util.Micros.toTimestamp(s.tsMicros)))
          } else {
            // max by (event time, s_no) across prior state + this batch
            val newest = (state.getOption.map(s => (s.tsMicros, s.sNo))
                ++ rows.map(p => (micros(p.ts), p.s_no))).max
            state.update(SeenState(newest._2, newest._1))
            state.setTimeoutTimestamp(newest._1 / 1000L + quietMs)
            Iterator.empty
          }
      }
  }
}
