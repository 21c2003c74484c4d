package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.EventTs

/** The encoding-adaptive events reader ([[graft.util.EventTs]]) — the r7
  * postmortem suite. The driver's events.parquet has shipped as both
  * TIMESTAMP(NANOS) (read as BIGINT nanos under nanosAsLong) and
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ); every events gate routes
  * through EventTs so a regenerated file with either encoding decodes to
  * the SAME wall-clock timestamps, and anything else fails loudly instead
  * of silently collapsing event time (the r7 failure mode: a pinned
  * LongType stream schema read micros as nanos, shrinking every timestamp
  * 1000x toward the epoch).
  */
class EventTsSpec extends SparkSpec {
  import spark.implicits._

  // one wall-clock instant, three physical encodings
  private val wallMicros = 1704110460123456L // 2024-01-01 12:01:00.123456 UTC

  test("LongType nanos branch truncates to the same micros") {
    val df = Seq((1L, wallMicros * 1000L + 789L)).toDF("event_id", "ts")
    assert(df.schema("ts").dataType == LongType)
    val out = EventTs.toMicros(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == wallMicros)
  }

  test("TIMESTAMP_NTZ micros branch stamps the UTC session zone losslessly") {
    val df = Seq((1L, wallMicros)).toDF("event_id", "us")
      .select(col("event_id"),
        expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = EventTs.toMicros(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == wallMicros)
  }

  test("TimestampType branch is the identity (idempotent re-application)") {
    val df = Seq((1L, wallMicros)).toDF("event_id", "us")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"))
    val once = EventTs.toMicros(df)
    val twice = EventTs.toMicros(once)
    assert(twice.schema("ts").dataType == TimestampType)
    assert(twice.select(unix_micros(col("ts"))).head.getLong(0) == wallMicros)
  }

  test("all three encodings of the same instant decode identically") {
    val nanos = EventTs.toMicros(
      Seq((1L, wallMicros * 1000L)).toDF("event_id", "ts"))
    val ntz = EventTs.toMicros(Seq((1L, wallMicros)).toDF("event_id", "us")
      .select(col("event_id"),
        expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts")))
    val tz = EventTs.toMicros(Seq((1L, wallMicros)).toDF("event_id", "us")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts")))
    val rendered = Seq(nanos, ntz, tz).map(
      _.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .head.getString(0)).distinct
    assert(rendered == Seq("2024-01-01 12:01:00.123456"))
  }

  test("an unsupported ts encoding fails loudly, not by coercion") {
    val df = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](EventTs.toMicros(df))
    assert(e.getMessage.contains("unsupported"))
  }

  test("nanosColTo round-trips a sentinel through every target encoding") {
    val nanos = 4102444800000000000L // 2100-01-01 as nanos
    val base = Seq((-1L, nanos)).toDF("event_id", "ts")
    for (target <- Seq(LongType, TimestampNTZType, TimestampType)) {
      val staged = EventTs.nanosColTo(base, target)
      assert(staged.schema("ts").dataType == target, s"target $target")
      val decoded = EventTs.toMicros(staged)
      assert(decoded.select(unix_micros(col("ts"))).head.getLong(0) ==
        nanos / 1000L, s"target $target")
    }
    intercept[IllegalArgumentException](EventTs.nanosColTo(base, StringType))
  }

  test("tri-SF smoke: the real testdata decodes to sane 2024 event times") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val ev = EventTs.readEvents(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"sf$sf")
      val (lo, hi) = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).as[(Long, Long)].head()
      // the generator emits 2024 event times; a stale-decode collapse lands
      // near the epoch (1970) and a nanos-as-micros blowup lands far future
      // — both are caught by a generous sanity band
      val y2020 = 1577836800000000L
      val y2040 = 2208988800000000L
      assert(lo >= y2020 && hi <= y2040,
        s"sf$sf decoded range [$lo, $hi] outside 2020..2040 — " +
          "events.ts encoding drift not handled")
      // the streaming gates' user schema must be the footer truth
      assert(EventTs.rawEventsSchema(spark, dir).fieldNames.contains("ts"))
    }
  }

  test("ts normalization blocks neither pushdown nor pruning on other columns") {
    // the withColumn over ts is a projection on top of the scan; Catalyst
    // must still push filters on sibling columns into the parquet scan
    // and prune ts entirely when a query never touches it
    val ev = EventTs.readEvents(spark, "/root/testdata/sf0.001")
      .filter(col("value") > 70.0)
      .select(col("event_id"), col("value"))
    val scan = ev.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThan(value,70.0)"), scan.take(800))
    assert(scan.contains("ReadSchema: struct<event_id:bigint,value:double>"),
      scan.take(800))
  }

  test("a re-encoded fixture (string ts) fails loudly through readEvents") {
    val stage = tmpDir("eventts_bad")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", date_format(col("ts").cast(TimestampType),
        "yyyy-MM-dd HH:mm:ss"))
      .write.mode("overwrite").parquet(s"$stage/events.parquet")
    intercept[IllegalArgumentException](EventTs.readEvents(spark, stage))
  }
}
