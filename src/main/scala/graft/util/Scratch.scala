package graft.util

import java.nio.file.{Files, Path, Paths}

/** Process-lifetime scratch directories: created under the scratch root
  * and recursively deleted by a shutdown hook. Gate queries that stage
  * files (streaming sources, export round-trips, checkpoints) return lazy
  * DataFrames still reading from these paths, so deletion must wait for
  * JVM exit — without the hook every Verify/Bench sweep strands staged
  * copies of the input tables in the scratch filesystem.
  *
  * Root selection (spark_optimization_guide §6 — I/O layout): everything
  * written here is ephemeral per-process data (micro-batch checkpoints of
  * throwaway gate queries, staged copies of immutable fixtures, scratch
  * lake tables), and its write pattern is many small create+rename+fsync
  * commits — the workload a memory-backed filesystem serves ~50x faster
  * than a virtual disk (measured on this host: 4k dsync writes 16 MB/s on
  * /tmp ext4 vs 821 MB/s on /dev/shm; the drain/lifecycle gates inflated
  * 2.5-6x whenever the host disk was contended, with CPU steal at 0%).
  * So the root is, in priority order:
  *
  *   1. `SPARK_GRAFT_SCRATCH` — deployments choose the medium: durable
  *      storage where checkpoint survival across machine loss matters,
  *      fast local disk/ramdisk for throwaway analytics scratch;
  *   2. `/dev/shm` when present and writable (Linux tmpfs);
  *   3. `java.io.tmpdir` otherwise.
  *
  * The per-process subdirectory keeps concurrent JVMs (sbt test forks,
  * a Verify beside a Bench) from colliding and makes the shutdown sweep
  * one recursive delete.
  */
object Scratch {

  /** Chosen scratch base + per-process subdir, created lazily. */
  lazy val root: Path = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH").map(Paths.get(_))
      .orElse {
        val shm = Paths.get("/dev/shm")
        if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
        else None
      }
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    Files.createDirectories(base)
    val r = Files.createTempDirectory(base, "graft-scratch-")
    created.add(r)
    r
  }

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p) catch { case _: Throwable => () }
    }
  }))

  /** A fresh scratch directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  /** Recursive delete that does NOT follow symlinks: a link inside a
    * scratch dir pointing at real data (a future staging optimization)
    * must have the LINK removed, never the target's contents. Public —
    * also the stale-output cleaner for [[graft.Verify]].
    */
  def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(deleteTree(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  private def deleteRecursively(p: Path): Unit = deleteTree(p)
}
