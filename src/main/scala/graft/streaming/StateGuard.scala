package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, StreamingQueryProgress}

/** Fail-fast circuit breaker on streaming state size.
  *
  * The r7 postmortem scenario: a source whose event times collapse (bad
  * decode, stuck producer clock, skewed late data) freezes the watermark
  * near the epoch, so watermark-evicted state — stream-stream join
  * buffers, window/session aggregates, dedup keys — stops evicting and
  * grows with the full history. At 100 TB that is an unbounded-state OOM
  * that surfaces as executor churn hours later; the right failure mode is
  * an immediate, attributable error the moment state exceeds what the
  * deployment sized its stores for.
  *
  * Two enforcement points, both cheap (progress metadata only — no state
  * store reads):
  *
  *   - [[StateGuard]] (a `StreamingQueryListener`): stops the offending
  *     query as soon as any micro-batch commit reports more total state
  *     rows than the cap, recording a diagnostic; [[StateGuard.assertClean]]
  *     rethrows it on the awaiting thread. Mid-flight, so a runaway query
  *     dies at the first oversized batch instead of quadratically.
  *   - [[StateGuard.audit]]: a synchronous post-run sweep of
  *     `query.recentProgress` for drains that already terminated — covers
  *     the final batch, whose listener event may still be in flight when
  *     `awaitTermination` returns.
  *
  * The trip is deliberately on `numRowsTotal` (rows held), not rows
  * updated: a hot batch is fine, a high-water mark that never drains is
  * the bug.
  */
final class StateGuard(spark: SparkSession, maxStateRows: Long)
    extends StreamingQueryListener {

  private val tripped = new ConcurrentHashMap[UUID, String]()

  def install(): this.type = { spark.streams.addListener(this); this }
  def uninstall(): Unit = spark.streams.removeListener(this)

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val rows = StateGuard.stateRows(p)
    // keyed by runId, not the checkpoint-stable query id: a query
    // RESTARTED after a trip gets a fresh runId, so the breaker arms
    // again for the new run (and a healthy restart is not poisoned by
    // the previous run's recorded trip)
    if (rows > maxStateRows && !tripped.containsKey(p.runId)) {
      tripped.put(p.runId, StateGuard.message(p, rows, maxStateRows))
      // stop() from the listener thread: the awaiting thread's
      // awaitTermination returns and assertClean rethrows the recorded
      // diagnostic — the message is in the map BEFORE the stop, so the
      // trip path has no publication race
      spark.streams.active.find(_.runId == p.runId).foreach(_.stop())
    }
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def trippedMessage(runId: UUID): Option[String] = Option(tripped.get(runId))

  /** Throw the recorded trip (if any) for `q`'s CURRENT run on the
    * caller's thread.
    */
  def assertClean(q: StreamingQuery): Unit =
    trippedMessage(q.runId).foreach(m => throw new IllegalStateException(m))
}

object StateGuard {

  /** Default cap for the gate drains: ~50x any legitimate gate state
    * (the largest — both buffered sides of a stream-stream join at sf0.1
    * — holds ~2e5 rows), small enough to beat an OOM. A deployment sizes
    * this to what its state stores were provisioned for.
    */
  val DefaultMaxStateRows: Long = 10L * 1000 * 1000

  def stateRows(p: StreamingQueryProgress): Long =
    p.stateOperators.map(_.numRowsTotal).sum

  private def message(p: StreamingQueryProgress, rows: Long,
      cap: Long): String =
    s"streaming state circuit breaker: query '${p.name}' (${p.id}) holds " +
      s"$rows state rows after batch ${p.batchId}, over the $cap cap — " +
      "state is not evicting (collapsed event times / frozen watermark " +
      s"at ${p.eventTime.getOrDefault("watermark", "?")}); failing fast " +
      "instead of growing unboundedly"

  /** Synchronous post-run audit over everything the query reported —
    * catches a final-batch breach whose listener event raced
    * `awaitTermination`.
    */
  def audit(q: StreamingQuery, maxStateRows: Long = DefaultMaxStateRows): Unit =
    q.recentProgress.foreach { p =>
      val rows = stateRows(p)
      if (rows > maxStateRows)
        throw new IllegalStateException(message(p, rows, maxStateRows))
    }
}
