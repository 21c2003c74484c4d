package graft.ext.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed batch-wise with `mapPartitions` over a typed Dataset
  * (the Scala analog of pandas-batch UDFs: amortize per-batch setup —
  * decoder init, model load — across a partition's rows).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): [[StubDecoder.decode]] produces deterministic fake features
  * from the payload bytes. Everything around it — schema, batch shape,
  * partition sizing, null/corrupt handling — is real and tested; swapping in
  * a real decoder changes only the function body.
  */
object Multimodal {

  /** A media row: payload + metadata the lake would carry alongside. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (the decoder output contract). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long, ok: Boolean)

  /** Deterministic fake decoder — stands in for an image/audio codec.
    * Derives "dimensions" and a checksum from the bytes; flags empty
    * payloads as corrupt instead of throwing (a decoder that throws kills
    * the task — at scale you always sandbox decode errors into a column).
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val bytes = Option(r.payload).getOrElse(Array.empty[Byte])
      if (bytes.isEmpty)
        MediaFeatures(r.media_id, r.kind, 0, 0, 0, 0L, ok = false)
      else {
        var acc = 0L
        var i = 0
        while (i < bytes.length) {
          acc = (acc * 31L + (bytes(i) & 0xffL)) % 1000000007L
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, bytes.length,
          width = (acc % 640L).toInt + 1,
          height = ((acc / 640L) % 480L).toInt + 1,
          checksum = acc, ok = true)
      }
    }
  }

  /** Byte-budget repartitioning: media rows are size-skewed, so partition by
    * total payload bytes, not row count — the binding constraint for decode
    * memory (SCALE.md). One cheap aggregate estimates total bytes, then a
    * round-robin repartition targets `targetBytesPerPartition`.
    */
  def repartitionByBytes(media: Dataset[MediaRow],
      targetBytesPerPartition: Long = 128L << 20): Dataset[MediaRow] = {
    // coalesce: sum over an empty Dataset is null, not 0
    val totalBytes = media.toDF()
      .select(coalesce(sum(length(col("payload")).cast("long")), lit(0L)))
      .collect().head.getLong(0)
    val n = math.max(1, (totalBytes / targetBytesPerPartition).toInt + 1)
    media.repartition(n)
  }

  /** Batch feature extraction: one decoder instantiation per partition, rows
    * streamed through it. Partition sizing note: media payloads are large —
    * repartition by byte budget (`maxPartitionBytes` down, or
    * `repartition(n)` after size estimation), never by row count alone.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (codec contexts, buffers)
      rows.map(StubDecoder.decode)
    }
  }

  /** Resize (downsample) stub: keep every `factor`-th byte — the
    * deterministic stand-in for an image resize; preserves the
    * transform-in-place shape (same schema out, smaller payload), which is
    * what matters for the Spark plumbing. A real implementation swaps the
    * byte loop for a codec call.
    */
  def resize(media: Dataset[MediaRow], factor: Int = 4): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.payload).getOrElse(Array.empty[Byte])
        val out = Array.tabulate(bytes.length / factor)(i => bytes(i * factor))
        MediaRow(r.media_id, r.kind, out)
      }
    }
  }

  /** Gate entry for [[resize]]: resized byte count + the [[StubDecoder]]
    * checksum over the decimated payload. Byte decimation over the ASCII
    * fixture is `substr` arithmetic, so the DuckDB oracle rebuilds the
    * exact resized payload and hash-pins the transform (not just its
    * length).
    */
  def resizeReport(spark: SparkSession, dir: String,
      factor: Int = 4): DataFrame = {
    import spark.implicits._
    resize(mediaFromDocuments(spark, dir), factor)
      .map { r =>
        val d = StubDecoder.decode(r)
        (r.media_id, d.n_bytes, d.checksum)
      }.toDF("media_id", "n_bytes", "checksum")
  }

  /** Build a media table from the documents fixture: text bytes as payload —
    * exercising the exact binary plumbing a real image column would use.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        lit("text/plain").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** A sampled "frame" from a media payload (the video-pipeline shape:
    * one input row explodes into `frame_idx` rows of fixed-size chunks).
    */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: split each payload into up to `maxFrames` fixed-size
    * chunks — the 1→N explode pattern a video decode uses (sample every Nth
    * frame). Runs as flatMap in codegen'd Dataset form; output rows carry
    * (media_id, frame_idx) so downstream feature extraction keys correctly.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
      maxFrames: Int = 4): Dataset[MediaFrame] = {
    implicit val enc = Encoders.product[MediaFrame]
    media.flatMap { r =>
      val bytes = Option(r.payload).getOrElse(Array.empty[Byte])
      val nFrames = math.min(maxFrames,
        math.max(1, bytes.length / math.max(frameBytes, 1)))
      val stride = math.max(1, bytes.length / nFrames)
      (0 until nFrames).iterator.map { i =>
        val start = i * stride
        MediaFrame(r.media_id, i,
          bytes.slice(start, math.min(start + frameBytes, bytes.length)))
      }
    }
  }

  /** Gate entry for [[sampleFrames]]: per-frame byte length plus the
    * [[StubDecoder]] checksum fold over each frame's bytes. Frame
    * boundaries and the checksum are integer arithmetic over the payload
    * (ASCII text bytes in the fixture), so the DuckDB oracle reproduces
    * the exact frame set with substring windows + the same polynomial
    * fold — the 1→N explode, stride math, and tail-frame truncation all
    * get hash-pinned, not just row counts.
    */
  def frameReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaFromDocuments(spark, dir))
      .map { f =>
        val d = StubDecoder.decode(MediaRow(f.media_id, "frame", f.frame))
        (f.media_id, f.frame_idx, d.n_bytes, d.checksum)
      }.toDF("media_id", "frame_idx", "frame_bytes", "frame_checksum")
  }

  /** The oracle-checkable query: features of the document-derived media.
    * checksum/width/height are reproducible in SQL because the stub decoder
    * is the same fold as [[graft.functions.PolyHash]].
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir)).toDF()
      .select("media_id", "kind", "n_bytes", "width", "height", "checksum", "ok")
}
