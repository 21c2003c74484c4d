package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Value-state TTL on `transformWithState` — the state-LIFECYCLE knob
  * the rest of the state matrix (timers, watermark eviction, RocksDB,
  * state reader) doesn't cover: a per-key running count kept in TWO
  * ValueStates inside the SAME processor, one with a processing-time
  * TTL and one without. After a pause longer than the TTL, the TTL'd
  * count restarts from zero while the durable twin keeps accumulating —
  * a DIFFERENTIAL proof that expired state stopped influencing output
  * (a restart artifact or checkpoint loss would reset both).
  *
  * At 100 TB this is the session/profile-cache shape: state for keys
  * that stop arriving is reclaimed by the store's TTL sweep without any
  * user-written timer bookkeeping, so state size tracks the ACTIVE key
  * set, not the all-time key set. TTL rides the micro-batch's
  * processing timestamp, so a gate controls it deterministically by
  * sleeping longer than the TTL between drains (expiry-on-read is
  * guaranteed once the next batch's timestamp passes the deadline).
  */
object TwsTtl {

  case class KeyedRow(station_id: Long)
  case class TtlOut(station_id: Long, ttl_c: Long, dur_c: Long)

  class TtlCountProcessor(ttlMillis: Long)
      extends StatefulProcessor[Long, KeyedRow, TtlOut] {
    @transient private var ttlCount: ValueState[Long] = _
    @transient private var durCount: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ttlCount = getHandle.getValueState[Long]("ttl_count",
        Encoders.scalaLong, TTLConfig(java.time.Duration.ofMillis(ttlMillis)))
      durCount = getHandle.getValueState[Long]("dur_count",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[KeyedRow],
        timerValues: TimerValues): Iterator[TtlOut] = {
      val n = rows.size.toLong
      val t = (if (ttlCount.exists()) ttlCount.get() else 0L) + n
      val d = (if (durCount.exists()) durCount.get() else 0L) + n
      ttlCount.update(t)
      durCount.update(d)
      Iterator.single(TtlOut(key, t, d))
    }
  }

  /** Update-mode per-key counts: one row per key per micro-batch with
    * the TTL'd and durable running counts side by side.
    */
  def countStream(rows: Dataset[KeyedRow], ttlMillis: Long): Dataset[TtlOut] = {
    implicit val encL = Encoders.scalaLong
    implicit val encO = Encoders.product[TtlOut]
    rows.groupByKey(_.station_id)
      .transformWithState(new TtlCountProcessor(ttlMillis),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
