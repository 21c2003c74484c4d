package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-drain decomposition probe: `sbt "runMain graft.DrainProbe
  * <name>..."` runs each named SparkEntry gate once (same session and
  * SF-dir contract as [[TimeOne]]) with a [[StreamingQueryListener]]
  * attached, and prints every micro-batch's `durationMs` breakdown
  * (triggerExecution / addBatch / getBatch / queryPlanning / walCommit /
  * commitOffsets) plus each stateful operator's commit time and any
  * RocksDB commit-latency custom metrics — the per-component evidence a
  * SCALE.md drain-floor row needs, which gate wall-clock alone cannot
  * give. Diagnostic only: nothing here is on any timed path.
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    val spark = GraftSession.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] query started: ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        def d(k: String): Long =
          if (dur.containsKey(k)) dur.get(k).longValue() else -1L
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d("triggerExecution")} addBatch=${d("addBatch")} " +
          s"getBatch=${d("getBatch")} latestOffset=${d("latestOffset")} " +
          s"plan=${d("queryPlanning")} wal=${d("walCommit")} " +
          s"commitOffsets=${d("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"[probe]   state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} " +
            s"updatesMs=${so.allUpdatesTimeMs} " +
            s"removalsMs=${so.allRemovalsTimeMs} " +
            s"memBytes=${so.memoryUsedBytes}")
          val cm = so.customMetrics
          if (!cm.isEmpty) {
            val keys = cm.keySet().toArray(Array.empty[String]).sorted
              .filter(k => k.toLowerCase.contains("commit") ||
                k.toLowerCase.contains("flush") ||
                k.toLowerCase.contains("checkpoint") ||
                k.toLowerCase.contains("snapshot") ||
                k.toLowerCase.contains("filesync"))
            if (keys.nonEmpty)
              println("[probe]     " + keys.map(k =>
                s"$k=${cm.get(k)}").mkString(" "))
          }
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"[probe] $name total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
