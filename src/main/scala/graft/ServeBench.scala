package graft

import java.net.{HttpURLConnection, URL}
import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Reproduction of the reference's own load-test tool as a Spark-side
  * harness (ref: Weather-Client/bitcask_client.py:45-74 — a
  * `ThreadPoolExecutor(max_workers=N)` of clients each running a full
  * `/stations` scan, reporting wall-clock seconds and success/N).
  *
  * N concurrent HTTP clients hit the real serving stack ([[graft.serve
  * .HttpShim]] over [[graft.serve.QueryApi]] over the latest-state
  * table); each client runs one full scan then a burst of point gets,
  * with the REFERENCE CLIENT'S timeouts as the pass bar: 10 s per scan,
  * 5 s per point get (ref: bitcask_client.py:13,35,48). Prints one JSON
  * line per run:
  *
  * {{{
  * {"metric":"serve_concurrency","sf":"…","clients":{
  *   "4":{"scan_ok":"4/4","scan_max_s":…,"scan_mean_s":…,
  *        "point_ok":"32/32","point_max_s":…,"point_mean_s":…},
  *   "16":{…}}}
  * }}}
  *
  * The serving table is materialized once up front (localCheckpoint) —
  * the deployed analog of the reference's in-memory BitCask keydir — so
  * per-request cost is the O(stations) collect + JSON render, not a lake
  * scan. Request concurrency is real end to end: the shim dispatches on
  * a pool and Spark accepts concurrent driver jobs.
  */
object ServeBench {

  private def get(url: String, timeoutMs: Int): Int = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    val code = conn.getResponseCode
    // getErrorStream is null when an error response carries no body —
    // guard, or the NPE in the finally masks the real failure
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    if (is != null) {
      try {
        val buf = new Array[Byte](8192)
        while (is.read(buf) != -1) {}
      } finally is.close()
    }
    code
  }

  private case class ClientRun(scanSec: Double, scanOk: Boolean,
      pointSecs: Seq[Double], pointOks: Int)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val pointsPerClient =
      sys.env.getOrElse("SPARK_GRAFT_SERVE_POINTS", "8").toInt

    // Serving table in the shim's archive schema, at the sf dir's station
    // cardinality: the scan payload is O(stations), so this is the same
    // serving load the reference's BitCask server carries at that scale.
    val nStations = spark.read.parquet(s"$dir/events.parquet")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id")))
      .head().getLong(0).toInt
    val latest = graft.core.LatestState.latest(
        graft.core.Normalize.toArchive(graft.gen.StationSource.messages(
          spark, nStations = nStations, perStation = 100)))
      .localCheckpoint(true)
    val api = new graft.serve.QueryApi(spark, latest, "latest_serve")
    val shim = new graft.serve.HttpShim(api)
    val port = shim.start()
    try {
      val ids = latest.select("station_id").collect().map(_.getLong(0)).sorted
      require(ids.nonEmpty, s"no stations in $dir")
      // one warm scan + point: plan/codegen/JIT, same convention as Bench
      require(get(s"http://localhost:$port/stations", 30000) == 200)
      require(get(s"http://localhost:$port/station?id=${ids.head}", 30000) == 200)

      val results = Seq(4, 16).map { n =>
        val pool = Executors.newFixedThreadPool(n)
        val futures = (0 until n).map { i =>
          pool.submit(new Callable[ClientRun] {
            override def call(): ClientRun = {
              val t0 = System.nanoTime()
              val scanOk =
                try get(s"http://localhost:$port/stations", 10000) == 200
                catch { case _: Exception => false }
              val scanSec = (System.nanoTime() - t0) / 1e9
              val points = (0 until pointsPerClient).map { j =>
                val id = ids((i * pointsPerClient + j) % ids.length)
                val t1 = System.nanoTime()
                val ok =
                  try get(s"http://localhost:$port/station?id=$id", 5000) == 200
                  catch { case _: Exception => false }
                ((System.nanoTime() - t1) / 1e9, ok)
              }
              ClientRun(scanSec, scanOk, points.map(_._1),
                points.count(_._2))
            }
          })
        }
        pool.shutdown()
        require(pool.awaitTermination(120, TimeUnit.SECONDS),
          s"serving clients still running after 120 s at fan-out $n")
        val runs = futures.map(_.get())
        val pointAll = runs.flatMap(_.pointSecs)
        val nPoints = n * pointsPerClient
        val pointStats = // points_per_client=0 → a scans-only run, not a crash
          if (pointAll.isEmpty) """"point_max_s":null,"point_mean_s":null}"""
          else f""""point_max_s":${pointAll.max}%.3f,""" +
            f""""point_mean_s":${pointAll.sum / pointAll.size}%.3f}"""
        n -> (f""""$n":{"scan_ok":"${runs.count(_.scanOk)}/$n",""" +
          f""""scan_max_s":${runs.map(_.scanSec).max}%.3f,""" +
          f""""scan_mean_s":${runs.map(_.scanSec).sum / n}%.3f,""" +
          f""""point_ok":"${runs.map(_.pointOks).sum}/$nPoints",""" +
          pointStats)
      }
      println(s"""{"metric":"serve_concurrency","sf":"$dir","points_per_client":$pointsPerClient,"clients":{${results.map(_._2).mkString(",")}}}""")
    } finally {
      shim.stop()
      spark.stop()
    }
  }
}
