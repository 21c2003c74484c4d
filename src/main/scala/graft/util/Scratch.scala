package graft.util

import java.nio.file.{Files, Path}

/** Process-lifetime scratch directories: created under the JVM temp root
  * and recursively deleted by a shutdown hook. Gate queries that stage
  * files (streaming sources, export round-trips, checkpoints) return lazy
  * DataFrames still reading from these paths, so deletion must wait for
  * JVM exit — without the hook every Verify/Bench sweep strands staged
  * copies of the input tables in /tmp.
  */
object Scratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p) catch { case _: Throwable => () }
    }
  }))

  /** A fresh scratch directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

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
