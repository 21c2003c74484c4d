package graft

import org.apache.spark.sql.functions._

class WireSourceSpec extends SparkSpec {

  private def expectedSurvivors(stations: Int, perStation: Int): Seq[(Long, Long)] =
    for {
      q <- 1L to perStation.toLong
      s <- 1L to stations.toLong
      if !graft.sources.WireSource.dropped(s, q)
      if !graft.sources.WireSource.malformed(s, q)
      if !graft.sources.WireSource.badEnum(s, q)
    } yield (s, q)

  test("wire source paces admission: ticksPerBatch ticks per trigger, all frames delivered") {
    val name = "wire_cadence_sink"
    val raw = spark.readStream
      .format(classOf[graft.sources.WireSourceProvider].getName)
      .option("stations", 10).option("perStation", 30)
      .option("ticksPerBatch", 10)
      .load()
    val parsed = graft.core.Normalize.toArchive(graft.core.Normalize
      .parseWire(graft.streaming.WeatherPipeline.decodeWire(raw)))
    val q = parsed.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val got = spark.table(name)
        .select(col("station_id"), col("s_no")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expectedSurvivors(10, 30).sorted)
      // 30 ticks at 10 per trigger: the admission control must have split
      // the replay into at least 3 data-carrying micro-batches
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3, s"expected >= 3 data batches, got $dataBatches")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("checkpoint restart resumes from the committed offset, exactly once") {
    // 400 ticks at 10 per trigger = 40 micro-batches: q1.stop() lands some
    // time after the first data batch is OBSERVED, so the run must carry
    // enough batches that a fast-batch/slow-poll scheduler cannot finish
    // all of them before the stop — with 4 batches this raced and the
    // "restart had work left" assertion could flake
    val stations = 8; val per = 400
    val ck = tmpDir("wire_ck"); val out = tmpDir("wire_out")
    def start() = {
      val raw = spark.readStream
        .format(classOf[graft.sources.WireSourceProvider].getName)
        .option("stations", stations).option("perStation", per)
        .option("ticksPerBatch", 10)
        .load()
      raw.selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck).format("parquet")
        .option("path", out).start()
    }
    // run until at least one data batch commits, then kill the query —
    // the restart must resume from the committed offset, not tick zero
    val q1 = start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = for {
      t <- 1L to per.toLong; s <- 1L to stations.toLong
      if !graft.sources.WireSource.dropped(s, t)
    } yield (s.toString, graft.sources.WireSource.frameJson(s, t))
    // exactly once: full set, no duplicates, and the restart actually had
    // work left to do (the first run was killed mid-replay)
    assert(rows.length == expected.size, s"${rows.length} vs ${expected.size}")
    assert(rows.sorted.toSeq == expected.sorted)
    assert(afterFirst < expected.size.toLong,
      s"first run already finished ($afterFirst rows) — restart untested")
  }

  test("malformed and invalid-enum frames are dropped by parse/normalize, not the source") {
    // the source must DELIVER the junk frames (transport doesn't validate);
    // the pipeline drops them — count raw vs parsed
    val stations = 10; val per = 20
    val raw = spark.readStream
      .format(classOf[graft.sources.WireSourceProvider].getName)
      .option("stations", stations).option("perStation", per)
      .option("ticksPerBatch", per)
      .load()
    val name = "wire_raw_sink"
    val q = graft.streaming.WeatherPipeline.decodeWire(raw)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val delivered = spark.table(name).count()
      val expectedDelivered = (for {
        qq <- 1L to per.toLong; s <- 1L to stations.toLong
        if !graft.sources.WireSource.dropped(s, qq)
      } yield 1).size.toLong
      assert(delivered == expectedDelivered,
        s"source must deliver malformed frames: $delivered vs $expectedDelivered")
      assert(delivered > expectedSurvivors(stations, per).size.toLong)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }
}
