package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Schema-adaptive normalization of the events table's `ts` column.
  *
  * The driver's `events.parquet` has shipped with two physical encodings
  * across testdata generations: TIMESTAMP(NANOS) (which Spark 4 reads as
  * BIGINT nanos under `spark.sql.legacy.parquet.nanosAsLong=true`) and
  * TIMESTAMP(MICROS) (which Spark reads natively as TIMESTAMP_NTZ). Every
  * event query wants the same logical column — a session-TZ (UTC)
  * microsecond TIMESTAMP — so the dtype dispatch lives here, once, instead
  * of 20 call sites assuming one encoding and breaking when the data
  * regenerates with the other. Both branches truncate/land on micros, the
  * same value DuckDB produces casting either encoding to TIMESTAMP, so
  * oracle hashes are encoding-independent. Known bound: Spark's `DIV`
  * truncates toward zero, so a PRE-1970 nanos value with a sub-micro
  * remainder would land 1 µs above a floor-based conversion — immaterial
  * for the generator's 2024+ event times, but revisit if testdata ever
  * ships pre-epoch timestamps.
  */
object EventTs {

  /** Normalize `ts` to a microsecond TIMESTAMP whatever the parquet
    * encoding was; idempotent on already-normalized frames.
    */
  def toMicros(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => // micros, no zone: stamp session (UTC) zone
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other")
    }

  /** Batch-read the events table with `ts` already normalized — THE entry
    * point for batch event queries; every gate goes through here so an
    * encoding drift in regenerated testdata fails loudly in one place
    * (the [[toMicros]] dispatch) instead of silently coercing at 20 sites.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    toMicros(spark.read.parquet(s"$dir/events.parquet"))

  /** The events file's actual on-disk schema (parquet footer truth). File
    * STREAM readers must pass a user schema; pinning a hand-written one
    * silently mis-decodes when the physical encoding drifts (a LongType
    * user schema over a TIMESTAMP(MICROS) file reads raw micros as if they
    * were nanos — the r7 failure). Inferring from the real footer and then
    * normalizing with [[toMicros]] after the read keeps streaming gates
    * encoding-independent, same as batch.
    */
  def rawEventsSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(s"$dir/events.parquet").schema

  /** File-STREAM twin of [[readEvents]]: read staged event files under
    * `stagePath` with the real footer schema of `dir`'s events file and
    * `ts` normalized — the one wiring every streaming gate shares, so no
    * site can forget the footer schema or the normalization (each alone
    * recreates the r7 pinned-schema bug).
    */
  def readEventsStream(spark: SparkSession, dir: String, stagePath: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.readStream.schema(rawEventsSchema(spark, dir))
    toMicros(options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .parquet(stagePath))
  }

  /** Re-encode a nanos-long `ts` column to `target` — the inverse dispatch
    * of [[toMicros]], for staging synthetic rows (flush sentinels) into the
    * same directory as real event files: a file-stream source needs every
    * file to decode under one schema, so the sentinel's encoding must match
    * whatever the driver shipped.
    */
  def nanosColTo(df: DataFrame, target: DataType): DataFrame = target match {
    case LongType => df
    case TimestampNTZType =>
      df.withColumn("ts",
        expr("timestamp_micros(ts DIV 1000)").cast(TimestampNTZType))
    case TimestampType =>
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case other => throw new IllegalArgumentException(
      s"cannot stage events.ts as unsupported type $other")
  }
}
