package graft

import org.apache.spark.sql.functions._
import graft.queries.EventOps

/** The round-3 gate additions exercised at sf0.001 (their sf0.01 twins are
  * driver-gated against DuckDB): watermark+append streaming window,
  * arrival-order latest, and the Kafka wire-frame decode path.
  */
class StreamingGatesSpec extends SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("RocksDB state store answers the stream-stream join identically") {
    // provider choice moves state off-heap; the emitted rows must be the
    // SAME set, and the session's provider conf must be restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.get(key)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val default = rows(EventOps.streamStreamJoin(spark, dir))
    val rocks = rows(EventOps.streamStreamJoinRocks(spark, dir))
    assert(rocks == default)
    assert(rocks.nonEmpty)
    assert(spark.conf.get(key) == before,
      "state-store provider conf leaked out of the drain")
  }

  test("append-mode watermarked window equals the batch q12 aggregate") {
    val streamed = EventOps.tumblingWindowStreamAppend(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.queries.Analytics.q12TumblingWindow(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    // append mode emits each finalized window exactly once — no duplicates
    val emitted = EventOps.tumblingWindowStreamAppend(spark, dir)
      .groupBy(col("bucket"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(emitted == 0)
  }

  test("WindowedStats tumbling append path equals the batch per-station windows") {
    val streamed = EventOps.windowedStatsAppend(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4))).toSet
    val batch = graft.util.EventTs.readEvents(spark, dir)
      .groupBy(window(col("ts"), "15 minutes").as("w"),
        col("user_id").as("station_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(round(col("value"), 0).cast("int")), 4).as("avg_humidity"),
        max((col("event_id") % 30).cast("int")).as("max_wind"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"),
        col("station_id"), col("n"), col("avg_humidity"), col("max_wind"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4))).toSet
    assert(streamed == batch)
  }

  test("rising-edge alerts fire only on below-to-above crossings in s_no order") {
    val got = EventOps.edgeAlertStream(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val want = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        round(col("value"), 0).cast("int").as("h"))
      .withColumn("prev", lag(col("h"), 1).over(w))
      .filter(col("h") > 70 && (col("prev").isNull || col("prev") <= 70))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("arrival-order latest keeps the max-s_no row, not the event-time winner") {
    val got = EventOps.latestArrivalStream(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id")).agg(max(col("event_id")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("value-state TTL expires the TTL'd count but not the durable twin") {
    val out = EventOps.stateTtlStream(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val events = spark.read.parquet(s"$dir/events.parquet")
    val want = events
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      .collect()
      .map { r =>
        val (nA, nB) = (r.getLong(1), r.getLong(2))
        r.getLong(0) -> ((if (nB > 0) nB else nA, nA + nB))
      }.toMap
    assert(out == want)
    // the differential must actually bite for at least one key: some key
    // with rows in BOTH slices shows last_ttl < last_dur (TTL'd state was
    // reclaimed across the pause while the durable twin accumulated)
    assert(out.exists { case (_, (ttl, dur)) => ttl < dur })
  }

  test("backfill handoff reconciles the overlap to exactly one copy") {
    val rows = EventOps.streamBackfill(spark, dir).collect()
    val events = spark.read.parquet(s"$dir/events.parquet")
    val want = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).cast("long"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val got = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // the overlap batch wrote ONLY its fresh half: versions partition
    // the log into bootstrap / fresh-overlap / tail with nothing counted
    // twice and nothing lost
    val t = events.agg(max(col("event_id"))).collect()(0).getLong(0) + 1
    val (half, twoThird) = (t / 2, 2 * t / 3)
    val n = events.count()
    val nBoot = events.filter(col("event_id") < half).count()
    val nOver = events.filter(col("event_id") >= half &&
      col("event_id") < twoThird).count()
    val r0 = rows.head
    assert((r0.getLong(3), r0.getLong(4), r0.getLong(5)) ==
      ((nBoot, nOver, n - nBoot - nOver)))
  }

  test("wire decode drops malformed JSON and invalid enums, keeps the rest") {
    val out = EventOps.wireDecode(spark, dir)
    val events = spark.read.parquet(s"$dir/events.parquet")
    val expected = events
      .filter(col("event_id") % 7 =!= 0 && col("event_id") % 11 =!= 0).count()
    assert(out.count() == expected)
    assert(out.filter(!col("battery_status").isin("low", "medium", "high"))
      .count() == 0)
    // battery mapping is the deterministic event_id % 3 rendering
    val bad = out.filter(
      (col("s_no") % 3 === 0 && col("battery_status") =!= "low") ||
      (col("s_no") % 3 === 1 && col("battery_status") =!= "medium") ||
      (col("s_no") % 3 === 2 && col("battery_status") =!= "high")).count()
    assert(bad == 0)
  }
}
