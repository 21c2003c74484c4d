package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  * oracle hashes are encoding-independent.
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
}
