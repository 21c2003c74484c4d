package graft.lake

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Manifest-based SNAPSHOT ISOLATION + TIME TRAVEL for a parquet table —
  * the mechanism under every lakehouse table format (Delta/Iceberg/Hudi),
  * reduced to its core: data files are immutable and append-only; each
  * version is a MANIFEST listing exactly the files visible at that
  * version; a manifest is published with an atomic hard-link creation
  * (single-winner: a concurrent append fails LOUDLY instead of silently
  * replacing the other writer's version), so readers either see a
  * complete version or the previous one, never a torn state. `read(version = N)` pins N's manifest and reproduces that
  * version's content bit-for-bit forever — concurrent appends cannot
  * perturb a running query, and yesterday's training run is re-readable
  * for audits/repro regardless of what landed since.
  *
  * Scale shape: an append writes only ITS files plus one manifest (cost ∝
  * delta, never table size — the new manifest references the old files,
  * it does not copy them); a versioned read plans a normal parquet scan
  * over the manifest's file list, so pushdown/pruning/AQE all apply
  * unchanged. Production swaps the `java.nio` calls for the Hadoop
  * FileSystem API (same atomic-rename contract on HDFS; object stores
  * need the format's log-based commit instead — exactly why Delta has
  * one) and adds manifest compaction past ~10⁵ files. The normal
  * deployment is the reference's single archiver (`Weather-Monitoring`'s
  * central station owns its archive directory — see SURVEY §3.1), but a
  * racing second writer is DETECTED, not absorbed: publication is
  * single-winner and the loser gets an explicit conflict error to retry
  * from a fresh `latestVersion` — the optimistic-concurrency loop the
  * production formats run, minus their automatic retry.
  */
object Snapshots {

  private def manifestDir(table: String): Path =
    Paths.get(table, "_manifests")

  /** Latest published version, 0 when the table is empty. */
  def latestVersion(table: String): Int = {
    val md = manifestDir(table)
    if (!Files.isDirectory(md)) return 0
    val s = Files.list(md)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toInt }
      .foldLeft(0)(math.max)
    finally s.close()
  }

  private def manifestFiles(table: String, version: Int): Seq[String] = {
    val m = manifestDir(table).resolve(s"v$version.list")
    require(Files.exists(m), s"no such version $version in $table")
    Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Append `df` as a new version; returns the published version number.
    * The data lands under a version-unique subdirectory first; the
    * manifest (old files + new files) is staged to a temp name and
    * published last via atomic hard-link creation — the publish point.
    *
    * `expectedVersion` is the compare-and-swap handle: pass the version
    * your read/transform was based on and the append fails if anyone
    * published past it in the meantime (otherwise the new version could
    * silently NOT include a concurrent append's rows in downstream
    * diffs). Omitted, the append chains onto whatever is latest at entry
    * — publication is still single-winner either way.
    */
  def append(df: DataFrame, table: String,
      expectedVersion: Option[Int] = None): Int =
    publish(df, table, expectedVersion, carryForward = true)

  /** Content-preserving REWRITE — the OPTIMIZE step of the lifecycle:
    * republish the latest version's content as `targetFiles` fresh
    * files under a new version whose manifest references ONLY them.
    * The read answer is unchanged (bit-for-bit the previous version's
    * rows); what changes is PROVENANCE — later versions no longer
    * reference the old small files, which is precisely what makes
    * [[vacuum]] able to reclaim them. Cost ∝ live table size, run it
    * when small-file count (not data) is the problem.
    */
  def rewrite(spark: SparkSession, table: String,
      targetFiles: Int = 1): Int = {
    val current = latestVersion(table)
    require(current > 0, s"table $table has no published versions")
    publish(read(spark, table, Some(current)).coalesce(targetFiles),
      table, Some(current), carryForward = false)
  }

  /** Retention VACUUM — physically delete data files referenced ONLY by
    * versions before `retainFrom`, plus those versions' manifests.
    * Safety is set arithmetic, not bookkeeping: the keep-set is the
    * union of every retained manifest's file list, so a file shared
    * with any retained version survives no matter how many expired
    * manifests also list it (append-only chains share everything —
    * vacuum only reclaims what a [[rewrite]] orphaned). Time travel to
    * expired versions fails loudly afterwards ("no such version") —
    * the retention contract every lakehouse format documents. Returns
    * `(dataFilesDeleted, versionsExpired)`.
    */
  def vacuum(table: String, retainFrom: Int): (Int, Int) = {
    val latest = latestVersion(table)
    require(retainFrom >= 1 && retainFrom <= latest,
      s"retainFrom must be in [1, $latest]: $retainFrom")
    val keep = (retainFrom to latest)
      .flatMap(manifestFiles(table, _)).toSet
    val expired = (1 until retainFrom)
      .filter(v => Files.exists(manifestDir(table).resolve(s"v$v.list")))
    val doomed = expired.flatMap(manifestFiles(table, _)).toSet -- keep
    doomed.foreach { rel =>
      Files.deleteIfExists(Paths.get(table).resolve(rel))
    }
    // manifests list only parquet files, so a fully reclaimed version
    // directory still holds writer residue (_SUCCESS, .crc sidecars) —
    // sweep any version dir whose parquet content is gone, or repeated
    // rewrite+vacuum cycles accumulate one orphan dir per version
    doomed.map(rel => Paths.get(table).resolve(rel).getParent).foreach {
      dir =>
        if (Files.isDirectory(dir)) {
          val left = Files.list(dir)
          val names =
            try {
              val b = scala.collection.mutable.ArrayBuffer[Path]()
              left.iterator().forEachRemaining(p => b += p)
              b.toSeq
            } finally left.close()
          if (!names.exists(_.getFileName.toString.endsWith(".parquet"))) {
            names.foreach(Files.deleteIfExists(_))
            Files.deleteIfExists(dir)
          }
        }
    }
    expired.foreach { v =>
      Files.deleteIfExists(manifestDir(table).resolve(s"v$v.list"))
    }
    (doomed.size, expired.size)
  }

  private def publish(df: DataFrame, table: String,
      expectedVersion: Option[Int], carryForward: Boolean): Int = {
    val dataDir = Paths.get(table, "data")
    Files.createDirectories(dataDir)
    Files.createDirectories(manifestDir(table))
    val current = expectedVersion.getOrElse(latestVersion(table))
    require(current >= 0, s"expectedVersion must be >= 0: $current")
    val next = current + 1
    val sub = s"v$next-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(dataDir.resolve(sub).toString)
    val s = Files.list(dataDir.resolve(sub))
    val fresh =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
        .map(f => s"data/$sub/$f")
      finally s.close()
    val all = (if (current == 0 || !carryForward) Seq.empty
               else manifestFiles(table, current)) ++ fresh
    val tmp = manifestDir(table).resolve(
      s"v$next-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, all.mkString("\n").getBytes("UTF-8"))
    // publish via hard-link creation, not rename: rename(2) silently
    // REPLACES an existing target, so two racing writers would both
    // "succeed" and one version would vanish; link(2) fails with EEXIST
    // atomically, making publication single-winner. The loser's staged
    // tmp is removed and the conflict surfaces as an error the caller
    // retries from a fresh latestVersion (the optimistic-concurrency
    // loop production formats run).
    val target = manifestDir(table).resolve(s"v$next.list")
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent append lost the race for version $next of $table" +
            " — re-read latestVersion and retry")
    }
    Files.deleteIfExists(tmp)
    next
  }

  /** Read the table at `version` (default: latest). The returned frame is
    * pinned to that version's manifest — later appends never change it.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(table))
    require(v > 0, s"table $table has no published versions")
    val paths = manifestFiles(table, v)
      .map(rel => Paths.get(table).resolve(rel).toString)
    spark.read.parquet(paths: _*)
  }

  /** Rows ADDED between `fromVersion` (exclusive) and `toVersion`
    * (inclusive) — the change-data-feed read ("give me what landed since
    * my last sync") that turns the snapshot log into an incremental
    * pipeline source. Because data files are immutable and appends only
    * ever ADD manifest entries, the delta is exactly the manifest set
    * difference — computed from two manifest reads, no data scan, then
    * planned as a normal parquet scan over only the delta files. A
    * downstream consumer at 100 TB reads ∝ what changed, never the
    * table.
    */
  def readChanges(spark: SparkSession, table: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion >= 0 && toVersion > fromVersion,
      s"need 0 <= from < to, got $fromVersion..$toVersion")
    val before =
      if (fromVersion == 0) Set.empty[String]
      else manifestFiles(table, fromVersion).toSet
    val added = manifestFiles(table, toVersion).filterNot(before)
    require(added.nonEmpty,
      s"no files added between v$fromVersion and v$toVersion")
    spark.read.parquet(
      added.map(rel => Paths.get(table).resolve(rel).toString): _*)
  }
}
