package graft

import org.apache.spark.sql.functions._
import graft.gen.StationSource
import graft.core.Normalize
import graft.index.IndexSink

object BulkCollector {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(String, String)]]()
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class IndexSinkSpec extends SparkSpec {

  lazy val archive = Normalize.toArchive(
    StationSource.messages(spark, nStations = 4, perStation = 30))

  test("replayed input indexes exactly once (doc-id dedup)") {
    val dir = tmpDir("idx")
    IndexSink.writeParquetIndex(archive.union(archive), dir)
    val idx = spark.read.parquet(dir)
    assert(idx.count() == archive.count())
    assert(idx.select("doc_id").distinct().count() == idx.count())
  }

  test("bulkUpsert batches and retries through transient failures") {
    BulkCollector.sent.clear(); BulkCollector.attempts.set(0)
    val docs = IndexSink.docs(archive).coalesce(1)
    IndexSink.bulkUpsert(docs, bulkSize = 10, maxAttempts = 3, retryDelayMs = 1L) {
      batch =>
        // first two calls fail (transient), then succeed — local-mode same JVM
        if (BulkCollector.attempts.incrementAndGet() <= 2)
          throw new RuntimeException("transient")
        BulkCollector.sent.add(batch)
        ()
    }
    val total = BulkCollector.sent.toArray.map(_.asInstanceOf[Seq[_]].size).sum
    assert(total == archive.count())
    assert(BulkCollector.sent.toArray.forall(_.asInstanceOf[Seq[_]].size <= 10))
  }
}
