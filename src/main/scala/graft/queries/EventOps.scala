package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 parity operators, expressed over the driver's `events` table
  * (`event_id, ts, user_id, event_type, value, props`) — the telemetry-shaped
  * stand-in for the reference's weather stream (user_id ↔ station_id,
  * event_id ↔ s_no, ts ↔ status_timestamp, props ↔ nested weather JSON).
  *
  * Each method is the batch-queryable form of a reference operator; the
  * streaming twins live in [[graft.streaming]] and the weather-domain API in
  * [[graft.core]]. Scale notes per operator in the Scaladoc.
  */
object EventOps {

  /** The events parquet stores TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read nanos as long and truncate to micros (same truncation
    * DuckDB applies casting TIMESTAMP_NS → TIMESTAMP). The nanosAsLong flag
    * is session config (GraftSession/Verify/Bench set it once) — query
    * functions don't mutate session state.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

  /** T1 — JSON parse with PERMISSIVE-drop semantics
    * (ref: Rain-Detector/Main.java:36-44, CentralStation.java:63).
    * `from_json` is codegen'd and runs map-side; corrupt rows become null
    * structs and are filtered — no exceptions, no driver involvement.
    */
  def jsonParse(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), schema).as("parsed"))
      .filter(col("parsed").isNotNull && col("parsed.k").isNotNull)
      .select(col("event_id"), col("parsed.k").as("k"))
  }

  /** T2+T3 — predicate filter on a reading + alert-string projection
    * (ref: Rain-Detector/Main.java:34-46). The filter is pushed into the
    * Parquet scan; the string build is a codegen'd concat. The decimal cast
    * makes the number format deterministic across engines.
    */
  def filterAlert(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("value") > 70.0)
      .select(col("event_id"),
        concat(lit("Raining alert! High humidity detected: "),
          col("value").cast(DecimalType(12, 2)).cast(StringType))
          .as("alert"))

  /** T4+T5+T7+T11 — schema normalization: rename to the archive shape,
    * calendar extraction for partition keys, lowercase + closed-enum
    * validation, round-to-int reading
    * (ref: CentralStation.java:91-120, ParquetArchiver.java:122-143).
    * Pure narrow projection — no shuffle, fully pushed/pruned.
    */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(lower(col("event_type"))
        .isin("click", "view", "purchase", "signup", "error"))
      .select(
        col("user_id").as("station_id"),
        col("event_id").as("s_no"),
        date_format(col("ts"), "yyyy-MM-dd").as("date"),
        hour(col("ts")).as("hour"),
        lower(col("event_type")).as("event_type"),
        round(col("value"), 0).cast(IntegerType).as("reading"))

  /** A1 — latest-value-per-key (the BitCask `put` semantics, event-time
    * corrected: max by (ts, s_no), ref: BitCask.java:119-141).
    * Implemented as `max_by(struct(...), struct(ts, event_id))` — a real
    * aggregate with map-side partial combine, NOT a window+row_number
    * (which would force a full shuffle+sort of every row at 100 TB; the
    * aggregate moves one row per key per partition).
    */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id").as("station_id"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("latest"))
      .select(col("station_id"),
        date_format(col("latest.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("latest.event_id").as("s_no"),
        col("latest.event_type").as("event_type"),
        round(col("latest.value"), 2).as("value"))

  /** A3 — keyed point lookup against the latest-value table
    * (ref: BitCask.java:143-168, CentralStationServer.java:43-58).
    * The station filter lands on the scan (partition-prunable when the lake
    * is partitioned by key); at serving scale this is the memory-sink /
    * state-store probe.
    */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    latestPerKey(spark, dir).filter(col("station_id") === 7)

  /** A8 — dedup on a key set with a deterministic representative
    * (ref: ES doc-id dedup, ParquetToElasticsearch.java:192-200).
    * `dropDuplicates` keeps an arbitrary row; at scale (and for oracle
    * comparison) we keep min(event_id) via aggregation instead — same
    * partial-agg shape as A1.
    */
  def dedupKeys(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_rows"), min(col("event_id")).as("first_event"))

  /** A7 — group-by-partition-key accounting (what
    * `write.partitionBy(date,hour)` does shuffle-free on write;
    * ref: ParquetArchiver.java:96-103).
    */
  def partitionCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date"),
        hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))

  /** S2-inverse — inter-arrival gap analysis per key (the reference's
    * sequence-gap/drop detection analog, WeatherStation.java:47-52).
    * Window `lag` partitioned by key: the sort is per-key within shuffle
    * partitions — no global sort. Micros arithmetic keeps it exact-integer
    * until the final rounded average.
    */
  def sessionGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_us")) / 1e6, 2).as("avg_gap_sec"),
        round(max(col("gap_us")) / lit(1e6), 2).as("max_gap_sec"))
  }

  /** T4-enum — closed-set validation accounting
    * (ref: WeatherStatus.avsc enum + isin check).
    */
  def enumValidate(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("valid",
        col("event_type").isin("click", "view", "purchase", "signup", "error"))

  /** T8/T9 — struct flatten → JSON document with a deterministic doc id
    * (the index-document shape, ref: ParquetToElasticsearch.java:193;
    * same `to_json(struct(...))` path as [[graft.core.Normalize.toIndexDocs]]).
    * Field set limited to types whose JSON rendering is byte-identical
    * across engines (integers, strings) so the doc string itself is hashed.
    */
  def docJson(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(col("user_id"), lit("_"), col("event_id")).as("doc_id"),
      to_json(struct(
        col("user_id").as("station_id"),
        col("event_id").as("s_no"),
        col("event_type"),
        struct(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          round(col("value"), 0).cast(IntegerType).as("reading")).as("meta")))
        .as("doc"))

  /** A4/K6 — full scan of the latest-value table served through the query
    * API (temp-view + SQL front-end), the reference's GET /stations
    * (ref: CentralStationServer.java:38-41).
    */
  def fullScan(spark: SparkSession, dir: String): DataFrame = {
    val api = new graft.serve.QueryApi(spark, latestPerKey(spark, dir))
    api.sql("SELECT station_id, s_no, event_type, value FROM latest")
  }

  /** K7 — CSV export + read-back round trip (ref: bitcask_client.py:11-29
    * CSV dump). Values must survive the text round trip exactly: longs and
    * strings trivially, doubles via shortest-decimal rendering (lossless
    * for round-tripped IEEE doubles).
    */
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Scratch.dir("graft_csv").toString
    latestPerKey(spark, dir)
      .coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(out)
    spark.read
      .option("header", "true")
      .schema("station_id BIGINT, ts STRING, s_no BIGINT, event_type STRING, value DOUBLE")
      .csv(out)
  }

  /** Row shape for the typed streaming-latest gate. */
  case class EventRecord(station_id: Long, s_no: Long,
      ts: java.sql.Timestamp, event_type: String, value: Double)

  /** A1-streaming gate — the SAME latest-per-key result as [[latestPerKey]],
    * produced through the streaming path: file-source micro-batch read
    * (S5), mapGroupsWithState latest state (A1), memory sink (A3/A4 serve),
    * drained with Trigger.AvailableNow. Deterministic because the input is
    * one parquet file → one micro-batch → exactly one Update row per key;
    * the driver hash-compares it against the batch oracle.
    */
  /** Wire schema + staged file source + memory-sink drain shared by the
    * streaming gates (one copy, so the gates can't silently diverge).
    * The file streaming source requires a DIRECTORY; the single events
    * file is staged into a scratch dir unchanged.
    */
  private val EventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.util.Scratch.dir("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    spark.readStream.schema(EventsSchema).parquet(stage.toString)
  }

  private def drainToMemory(spark: SparkSession, df: DataFrame, sink: String,
      mode: org.apache.spark.sql.streaming.OutputMode): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    spark.catalog.dropTempView(sink)
    val q = df.writeStream
      .outputMode(mode)
      .format("memory").queryName(sink)
      .option("checkpointLocation",
        graft.util.Scratch.dir("graft_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  def latestPerKeyStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val enc = org.apache.spark.sql.Encoders.product[EventRecord]
    implicit val keyEnc = org.apache.spark.sql.Encoders.scalaLong
    val rec = eventsStream(spark, dir)
      .select(col("user_id").as("station_id"), col("event_id").as("s_no"),
        expr("timestamp_micros(ts DIV 1000)").as("ts"),
        col("event_type"), col("value")).as[EventRecord]
    val latest = graft.core.LatestState.latestStreamBy(rec)(_.station_id) { r =>
      val i = r.ts.toInstant
      (i.getEpochSecond * 1000000L + i.getNano / 1000L, r.s_no)
    }
    drainToMemory(spark, latest.toDF(), "latest_stream_gate", OutputMode.Update())
      .select(col("station_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("s_no"), col("event_type"),
        round(col("value"), 2).as("value"))
  }

  /** The event-type counts computed through [[graft.operators.Scale
    * .saltedAggregate]] — gates the skew machinery itself: the two-phase
    * (key, salt) → key aggregation must be value-identical to the plain
    * GROUP BY the oracle runs. Five event types with ~120k rows each at
    * sf0.1 is exactly the hot-reducer-key shape salting exists for.
    */
  def saltedTypeStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale
    import graft.operators.Scale.TwoPhase
    val df = events(spark, dir)
      .select(col("event_type"), col("value"))
    // the sum is over integer cents (floor(v*100+0.5)): associative and
    // exact, so the per-salt partial order can never shift a rounded
    // decimal the way FP double summation could
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    Scale.saltedAggregate(df.withColumn("cents", cents),
      Seq("event_type"), nSalts = 8, Seq(
        TwoPhase.countAll("n"),
        TwoPhase.sumOf("sum_cents", col("cents")),
        TwoPhase.minOf("min_value", col("value")),
        TwoPhase.maxOf("max_value", col("value"))))
      .select(col("event_type"), col("n").cast("long").as("n"),
        col("sum_cents").cast("long").as("sum_cents"),
        round(col("min_value"), 2).as("min_value"),
        round(col("max_value"), 2).as("max_value"))
  }

  /** A join executed through [[graft.operators.Scale.writeBucketed]]
    * bucketed tables — gates the co-located-join machinery end to end:
    * both sides are persisted bucketed by `user_id` (the write-time
    * shuffle that every later join amortizes; `ScaleSpec` separately
    * plan-asserts such joins need no Exchange), then joined and
    * aggregated. Values must equal the oracle's plain join.
    */
  def bucketedJoinStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    Scale.writeBucketed(ev, "graft_events_bkt", "user_id", nBuckets = 8)
    val totals = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    Scale.writeBucketed(totals, "graft_totals_bkt", "user_id", nBuckets = 8)
    spark.table("graft_events_bkt")
      .join(spark.table("graft_totals_bkt"), "user_id")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        first(col("n_events")).as("n_events"))
  }

  /** The q12 tumbling-window aggregate produced through the REAL streaming
    * path: file-source micro-batches → streaming window aggregate →
    * memory sink, drained with `Trigger.AvailableNow`. Complete output
    * mode re-emits every window each trigger, so the drained result
    * equals the batch aggregate deterministically — no watermark to drop
    * late rows, no append-mode finalization races. Gate-compared to the
    * same DuckDB oracle as the batch q12.
    */
  def tumblingWindowStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val agg = eventsStream(spark, dir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    drainToMemory(spark, agg, "window_stream_gate", OutputMode.Complete())
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))
  }
}
