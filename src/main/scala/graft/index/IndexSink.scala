package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.{Dedup, Normalize}

/** K5/A8 — the idempotent-upsert index sink abstraction.
  *
  * The reference bulk-indexes into Elasticsearch with deterministic doc ids
  * (`station_id_s_no`) so re-indexing is an upsert
  * (ref: SparkParquetStreamingToElasticsearch.java:89-157,
  * ParquetToElasticsearch.java:182-243). No ES in this environment, so the
  * sink is generic: dedup → (doc_id, doc-json) rows → a pluggable writer.
  * The parquet writer stands in for ES in tests; a real ES writer would be a
  * `foreachBatch` using the same `docs` frame, writing
  * partition-parallel from executors — NOT the reference's collect-to-driver
  * loop (SparkParquetStreamingToElasticsearch.java:124), which caps
  * throughput at one node and OOMs the driver at scale.
  */
object IndexSink {

  /** Archive rows → deduped, indexable (doc_id, doc) frame. */
  def docs(archive: DataFrame): DataFrame =
    Normalize.toIndexDocs(Dedup.exactReplays(archive))

  /** Batch "index": one row per doc_id, persisted as parquet. [[docs]]
    * already dedups on (station_id, s_no) and `doc_id = "<station>_<s_no>"`
    * is injective for that pair, so doc_id uniqueness holds by
    * construction — no second dedup aggregation here (an earlier
    * `groupBy(doc_id)` re-shuffled the whole frame to collapse groups
    * that were provably singletons). Overwrite of the target dir models
    * the idempotent-upsert effect for a full re-index; incremental upsert
    * is `foreachBatch` + merge in a real index store.
    */
  def writeParquetIndex(archive: DataFrame, path: String): Unit =
    docs(archive).write.mode("overwrite").parquet(path)

  /** Executor-side bulk upsert hook: partition-parallel, batched, retried.
    * `send` is the transport (ES bulk call in production, a collector in
    * tests) — invoked per batch of `bulkSize` docs with `maxAttempts` × fixed
    * `retryDelayMs` retry, mirroring the reference's policy
    * (ref: SparkParquetStreamingToElasticsearch.java:172-208: 100 docs,
    * 3 attempts, 500 ms).
    */
  def bulkUpsert(
      docsDf: DataFrame,
      bulkSize: Int = 100,
      maxAttempts: Int = 3,
      retryDelayMs: Long = 500L)(send: Seq[(String, String)] => Unit): Unit = {
    docsDf.select("doc_id", "doc").foreachPartition { rows: Iterator[Row] =>
      rows.map(r => (r.getString(0), r.getString(1)))
        .grouped(bulkSize)
        .foreach { batch =>
          var attempt = 0
          var done = false
          while (!done) {
            attempt += 1
            try { send(batch.toSeq); done = true }
            catch {
              case e: Exception if attempt < maxAttempts =>
                Thread.sleep(retryDelayMs)
              case e: Exception =>
                // reference logs-and-drops after final attempt
                // (SparkParquetStreamingToElasticsearch.java:199-204)
                org.slf4j.LoggerFactory.getLogger(getClass)
                  .error(s"bulk upsert dropped after $attempt attempts", e)
                done = true
            }
          }
        }
    }
  }
}
