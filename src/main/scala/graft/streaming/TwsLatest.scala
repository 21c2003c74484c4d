package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Latest-per-key on Spark 4's `transformWithState` — the arbitrary
  * stateful processing API succeeding mapGroupsWithState: explicit typed
  * state handles (ValueState/ListState/MapState), a timer registry, TTL
  * support, and the state-v2 RocksDB format. Functionally the twin of
  * the mapGroupsWithState path in [[graft.core.LatestState]]; gated as
  * `p_latest_tws` so BOTH stateful APIs are oracle-proven against the
  * same latest-per-key answer. Requires the RocksDB state store provider
  * (transformWithState does not run on the default HDFS-backed store).
  */
object TwsLatest {

  case class Rec(station_id: Long, s_no: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  private def micros(t: java.sql.Timestamp): Long =
    graft.util.Micros.fromTimestamp(t)

  /** One ValueState[Rec] per station: merge the batch's rows with the
    * stored record by (event time, s_no) and emit the new winner — the
    * BitCask `put` with event-time correction, expressed in the new API.
    */
  class LatestProcessor extends StatefulProcessor[Long, Rec, Rec] {
    @transient private var latest: ValueState[Rec] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[Rec]("latest",
        Encoders.product[Rec], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Rec],
        timerValues: TimerValues): Iterator[Rec] = {
      val prev = if (latest.exists()) Iterator.single(latest.get()) else Iterator.empty
      val newest = (prev ++ rows).maxBy(r => (micros(r.ts), r.s_no))
      latest.update(newest)
      Iterator.single(newest)
    }
  }

  /** Update-mode latest stream: one row per key per micro-batch carrying
    * the current winner (same contract as `LatestState.latestStream`).
    */
  def latestStream(recs: Dataset[Rec]): Dataset[Rec] = {
    implicit val encL = Encoders.scalaLong
    implicit val encR = Encoders.product[Rec]
    recs.groupByKey(_.station_id)
      .transformWithState(new LatestProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
