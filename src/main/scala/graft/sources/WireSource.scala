package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 micro-batch WIRE source — the reference's station
  * transport (WeatherStation.java:58-69 producing to Kafka,
  * CentralStation.java:51-89 consuming) replayed through the SAME Source
  * API surface the Kafka connector implements: a `TableProvider` whose
  * `MicroBatchStream` hands Spark offset ranges and distributed partition
  * readers. No broker exists in this environment, so the frames are
  * generated deterministically — but everything the engine exercises
  * (offset bookkeeping, per-trigger admission, partitioned readers,
  * AvailableNow draining, kafka-shaped binary key/value rows feeding the
  * decode → parse → normalize pipeline) is the real connector contract,
  * closing the S4 transport gap as far as this sandbox allows.
  *
  * Semantics per tick t (= sequence number, 1-based): every station
  * emits one frame, then the lossy channel drops ~10 % AFTER sequence
  * assignment (gap semantics, ref WeatherStation.java:47-52), ~1/13 of
  * surviving frames are malformed junk (exercising drop-on-parse-fail),
  * and ~1/17 carry an invalid battery enum (dropped by the normalize
  * CHECK). All selection arithmetic is small-integer modular math, so a
  * SQL oracle can reproduce the exact surviving row set.
  *
  * An offset is the number of ticks admitted; a micro-batch covers ticks
  * (start, end] across all stations, split into `numPartitions` station
  * ranges — each reader generates only its slice (distributed, no driver
  * state beyond the offset counter, like the rate source).
  */
object WireSource {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType)))

  val StartEpochSec = 1700000000L

  def dropped(s: Long, q: Long): Boolean = (s * 7919L + q * 104729L) % 10L == 0L
  def malformed(s: Long, q: Long): Boolean = (s * 257L + q * 101L) % 13L == 0L
  def badEnum(s: Long, q: Long): Boolean = (s * 37L + q * 61L) % 17L == 0L

  def battery(s: Long, q: Long): String = {
    val r = (s * 131L + q * 137L) % 10L
    if (r < 3) "LOW" else if (r < 7) "MEDIUM" else "HIGH"
  }
  def humidity(s: Long, q: Long): Int = ((s * 31L + q * 17L) % 91L + 10L).toInt
  def temperature(s: Long, q: Long): Int = ((s * 13L + q * 7L) % 79L + 32L).toInt
  def windSpeed(s: Long, q: Long): Int = ((s * 3L + q * 23L) % 61L).toInt

  /** The wire JSON layout (ref WeatherStation.java:56-62). */
  def frameJson(s: Long, q: Long): String =
    if (malformed(s, q)) "not json {"
    else {
      val bat = if (badEnum(s, q)) "BROKEN" else battery(s, q)
      s"""{"stationId":$s,"sequenceNumber":$q,"batteryStatus":"$bat",""" +
        s""""statusTimestamp":${(StartEpochSec + (q - 1)) * 1000L},""" +
        s""""weather":{"humidity":${humidity(s, q)},""" +
        s""""temperature":${temperature(s, q)},""" +
        s""""wind_speed":${windSpeed(s, q)}}}"""
    }
}

case class WireConfig(stations: Int, perStation: Int, ticksPerBatch: Int,
    numPartitions: Int)

object WireConfig {
  def from(options: CaseInsensitiveStringMap): WireConfig = {
    def geti(k: String, d: Int) = options.getInt(k, d)
    val c = WireConfig(geti("stations", 40), geti("perStation", 50),
      geti("ticksPerBatch", 25), geti("numPartitions", 4))
    require(c.stations > 0 && c.perStation > 0 && c.ticksPerBatch > 0 &&
      c.numPartitions > 0, s"wire source options must be positive: $c")
    c
  }
}

class WireSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WireTable(WireConfig.from(new CaseInsensitiveStringMap(properties)))
}

class WireTable(cfg: WireConfig) extends Table with SupportsRead {
  override def name(): String = s"wire(${cfg.stations}x${cfg.perStation})"
  override def schema(): StructType = WireSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WireSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new WireMicroBatchStream(cfg)
      }
    }
}

/** Offset = ticks admitted so far (JSON: the long itself). */
case class WireOffset(tick: Long) extends Offset {
  override def json(): String = tick.toString
}

class WireMicroBatchStream(cfg: WireConfig)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // AvailableNow freezes the replay target (already static here: the full
  // perStation range). Admission stays limit-paced in that mode too — the
  // wrapper keeps triggering until the target is reached, exactly how the
  // Kafka connector honors maxOffsetsPerTrigger under AvailableNow —
  // rather than collapsing the remainder into one unbounded batch.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = WireOffset(0L)

  // the per-station cadence is expressed as the source's DEFAULT read
  // limit (ticksPerBatch ticks × stations rows), the same way the Kafka
  // connector surfaces maxOffsetsPerTrigger — so an engine-supplied
  // throttle composes instead of being ignored. The limit is honored
  // BEST-EFFORT at tick granularity (Kafka-style): offsets advance in
  // whole ticks of `stations` rows, so an engine ReadMaxRows smaller
  // than one tick still admits the floor of one full tick — a bounded
  // overshoot of at most `stations - 1` rows, never an unbounded batch
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(cfg.ticksPerBatch.toLong * cfg.stations)

  private def ticksFor(limit: ReadLimit): Long = limit match {
    case m: ReadMaxRows => math.max(1L, m.maxRows() / cfg.stations)
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst {
        case m: ReadMaxRows => math.max(1L, m.maxRows() / cfg.stations)
      }.getOrElse(Long.MaxValue)
    case _: ReadAllAvailable => Long.MaxValue
    case _ => Long.MaxValue // minRows etc.: no upper bound implied
  }

  // SupportsAdmissionControl form: admission is a pure function of the
  // start offset and the engine's limit. No mutable counter, so
  // restart/recovery trivially never regresses.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[WireOffset].tick
    val t = ticksFor(limit)
    val next = if (t == Long.MaxValue) cfg.perStation.toLong
               else math.min(from + t, cfg.perStation.toLong)
    WireOffset(math.max(from, next))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset =
    WireOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WireOffset].tick
    val hi = end.asInstanceOf[WireOffset].tick
    val per = math.max(1, (cfg.stations + cfg.numPartitions - 1) / cfg.numPartitions)
    (1 to cfg.stations by per).map { sLo =>
      WireInputPartition(sLo, math.min(sLo + per - 1, cfg.stations), lo + 1, hi)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new WirePartitionReader(partition.asInstanceOf[WireInputPartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Station range [sLo, sHi] × sequence range [qLo, qHi] (inclusive). */
case class WireInputPartition(sLo: Int, sHi: Int, qLo: Long, qHi: Long)
    extends InputPartition

class WirePartitionReader(p: WireInputPartition)
    extends PartitionReader[InternalRow] {
  private var q = p.qLo
  private var s = p.sLo - 1
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (q <= p.qHi) {
      s += 1
      if (s > p.sHi) { s = p.sLo - 1; q += 1 }
      else if (!WireSource.dropped(s.toLong, q)) {
        row = InternalRow(
          s.toString.getBytes("UTF-8"),
          WireSource.frameJson(s.toLong, q).getBytes("UTF-8"))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
