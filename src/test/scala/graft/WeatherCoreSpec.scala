package graft

import org.apache.spark.sql.functions._
import graft.gen.StationSource
import graft.core.{Alerts, Dedup, LatestState, Normalize}
import graft.schema.WeatherSchema

class StationSourceSpec extends SparkSpec {

  lazy val msgs = StationSource.messages(spark, nStations = 10, perStation = 200)

  test("generator is deterministic and drops ~10% with surviving gaps") {
    val n = msgs.count()
    assert(n == StationSource.messages(spark, 10, 200).count())
    // 2000 rows pre-drop, ~10% dropped
    assert(n > 1600 && n < 1980, s"got $n")
    // sequence gaps exist: per-station max s_no > per-station count
    val gappy = msgs.groupBy("stationId")
      .agg(max("sequenceNumber").as("mx"), count(lit(1)).as("cnt"))
      .filter(col("mx") > col("cnt")).count()
    assert(gappy > 0)
  }

  test("value ranges and battery distribution match the reference contract") {
    val bad = msgs.filter(
      col("weather.humidity") < 10 || col("weather.humidity") > 100 ||
      col("weather.temperature") < 32 || col("weather.temperature") > 110 ||
      col("weather.wind_speed") < 0 || col("weather.wind_speed") > 60 ||
      !col("batteryStatus").isin(WeatherSchema.BatteryStates: _*)).count()
    assert(bad == 0)
    val m = msgs.filter(col("batteryStatus") === "medium").count().toDouble / msgs.count()
    assert(m > 0.3 && m < 0.5, s"medium share $m")  // target 0.4
  }

  test("per-station sequence numbers are strictly increasing") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("stationId").orderBy("statusTimestamp")
    val nonMono = msgs
      .withColumn("prev", lag("sequenceNumber", 1).over(w))
      .filter(col("prev").isNotNull && col("sequenceNumber") <= col("prev"))
      .count()
    assert(nonMono == 0)
  }
}

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  val good = """{"stationId":1,"sequenceNumber":7,"batteryStatus":"MEDIUM","statusTimestamp":1755000000000,"weather":{"humidity":83,"temperature":72,"wind_speed":13}}"""
  val badEnum = """{"stationId":2,"sequenceNumber":1,"batteryStatus":"full","statusTimestamp":1755000000000,"weather":{"humidity":10,"temperature":50,"wind_speed":5}}"""
  val malformed = """{"stationId": oops"""

  test("parseWire drops malformed rows, toArchive renames and validates enum") {
    val raw = Seq(good, badEnum, malformed).toDF("value")
    val wire = Normalize.parseWire(raw)
    assert(wire.count() == 2)  // malformed dropped
    val archive = Normalize.toArchive(wire)
    val rows = archive.collect()
    assert(rows.length == 1)   // bad enum rejected
    val r = rows.head
    assert(r.getAs[Long]("station_id") == 1L)
    assert(r.getAs[Long]("s_no") == 7L)
    assert(r.getAs[String]("battery_status") == "medium") // lowercased
    assert(r.getAs[java.sql.Timestamp]("status_timestamp").getTime == 1755000000000L)
  }

  test("partition keys derive from event time in UTC") {
    val archive = Normalize.toArchive(Normalize.parseWire(Seq(good).toDF("value")))
    val keyed = Normalize.withPartitionKeys(archive).collect().head
    assert(keyed.getAs[String]("date") == "2025-08-12")
    assert(keyed.getAs[Int]("hour") == 12)   // 1755000000 = 2025-08-12T12:00:00Z
  }

  test("index docs carry deterministic doc ids") {
    val archive = Normalize.toArchive(Normalize.parseWire(Seq(good).toDF("value")))
    val doc = Normalize.toIndexDocs(archive).collect().head
    assert(doc.getAs[String]("doc_id") == "1_7")
    assert(doc.getAs[String]("doc").contains("\"battery_status\":\"medium\""))
  }
}

class LatestStateSpec extends SparkSpec {

  lazy val archive = Normalize.toArchive(
    StationSource.messages(spark, nStations = 5, perStation = 100))

  test("batch latest picks the event-time max per station") {
    val latest = LatestState.latest(archive).collect()
    assert(latest.length == 5)
    val expect = archive.groupBy("station_id").agg(max("s_no").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    latest.foreach { r =>
      assert(r.getAs[Long]("s_no") == expect(r.getAs[Long]("station_id")))
    }
  }

  test("late (out-of-order) rows do not overwrite newer state in event-time mode") {
    import spark.implicits._
    val rows = Seq(
      (1L, 5L, "high", new java.sql.Timestamp(5000L)),
      (1L, 3L, "low",  new java.sql.Timestamp(3000L))   // late arrival
    ).toDF("station_id", "s_no", "battery_status", "status_timestamp")
      .withColumn("weather", struct(lit(50).as("humidity"),
        lit(70).as("temperature"), lit(10).as("wind_speed")))
    val r = LatestState.latest(rows).collect().head
    assert(r.getAs[Long]("s_no") == 5L)
  }

  test("dedup: exact replays collapse, deterministic variant is stable") {
    val dup = archive.union(archive)
    assert(Dedup.exactReplays(dup).count() == archive.count())
    assert(Dedup.deterministic(dup).count() == archive.count())
  }

  test("dedup: streaming form drops replays with watermark-bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.schema.{WeatherReading, WeatherStatus}
    implicit val sq = spark.sqlContext
    import spark.implicits._

    def st(sno: Long, hum: Int) = WeatherStatus(1L, sno, "high",
      new java.sql.Timestamp(1700000000000L + sno * 1000L),
      WeatherReading(hum, 70, 5))

    val input = MemoryStream[WeatherStatus]
    val q = graft.core.Dedup.streaming(input.toDF(), "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_streaming_gate").start()
    try {
      input.addData(st(1, 50), st(2, 60), st(2, 60)) // in-batch replay
      q.processAllAvailable()
      input.addData(st(1, 50), st(3, 70)) // cross-batch replay + new row
      q.processAllAvailable()
      val out = spark.table("dedup_streaming_gate").collect()
        .map(_.getAs[Long]("s_no")).sorted.toSeq
      assert(out == Seq(1L, 2L, 3L), s"got $out")
      // dropDuplicatesWithinWatermark keys state on the identity only and
      // evicts by watermark — the plan must carry the WithinWatermark
      // variant, not the never-evicting plain dedup-on-subset
      val plan = q.lastProgress.stateOperators.map(_.operatorName).mkString(",")
      assert(plan.contains("dedupeWithinWatermark"), plan)
    } finally {
      q.stop()
      spark.catalog.dropTempView("dedup_streaming_gate")
    }
  }
}

class AlertsSpec extends SparkSpec {

  test("alerts fire only above threshold and carry the reference prefix") {
    val archive = Normalize.toArchive(
      StationSource.messages(spark, nStations = 3, perStation = 200))
    val nHigh = archive.filter(col("weather.humidity") > 70).count()
    val alerts = Alerts.alerts(archive, "station_id").collect()
    assert(alerts.length == nHigh && nHigh > 0)
    assert(alerts.forall(_.getAs[String]("value").startsWith(Alerts.AlertPrefix)))
    // null weather must not alert (three-valued logic)
    import spark.implicits._
    val nullRow = Seq((1L, null.asInstanceOf[String])).toDF("station_id", "x")
      .withColumn("weather",
        when(col("x").isNotNull, struct(lit(99).as("humidity"),
          lit(0).as("temperature"), lit(0).as("wind_speed"))))
      .drop("x")
    assert(Alerts.rainingRows(nullRow).count() == 0)
  }
}
