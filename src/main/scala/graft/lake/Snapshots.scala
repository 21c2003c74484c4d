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

  private def manifestLines(table: String, version: Int): Seq[String] = {
    val m = manifestDir(table).resolve(s"v$version.list")
    require(Files.exists(m), s"no such version $version in $table")
    Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
  }

  private def manifestFiles(table: String, version: Int): Seq[String] =
    manifestLines(table, version).filterNot(_.startsWith("#"))

  /** Operation kind that produced `version`: "append", "rewrite", or
    * "delete". Recorded as a `#op=` header line in the manifest; a
    * header-less manifest (pre-header table) reads as "append".
    */
  def opKind(table: String, version: Int): String =
    manifestLines(table, version).collectFirst {
      case l if l.startsWith("#op=") =>
        l.stripPrefix("#op=").takeWhile(_ != '|')
    }.getOrElse("append")

  /** The SQL predicate a `delete` version removed, None otherwise.
    * Stored base64-encoded in the manifest header so the change feed
    * can replay exactly which rows a version erased.
    */
  def deletePredicate(table: String, version: Int): Option[String] =
    manifestLines(table, version).collectFirst {
      case l if l.startsWith("#op=delete|") =>
        new String(java.util.Base64.getDecoder.decode(
          l.stripPrefix("#op=delete|")), "UTF-8")
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
      expectedVersion: Option[Int], carryForward: Boolean,
      extraHeaders: Seq[String] = Nil): Int = {
    val current = expectedVersion.getOrElse(latestVersion(table))
    require(current >= 0, s"expectedVersion must be >= 0: $current")
    val next = current + 1
    val (sub, fresh) = writeData(df, table, next)
    // commit-log stats, the production pattern (Delta's commitInfo /
    // Iceberg's snapshot summary): count the WRITTEN delta files, not
    // the input plan — delta-sized cost, and the number describes what
    // actually landed even if the input was nondeterministic
    val rows =
      if (fresh.isEmpty) 0L
      else df.sparkSession.read.parquet(
        fresh.map(f => Paths.get(table).resolve(f).toString): _*).count()
    val all = (if (current == 0 || !carryForward) Seq.empty
               else manifestFiles(table, current)) ++ fresh
    val op = if (carryForward) "append" else "rewrite"
    publishManifest(table, next,
      (s"#op=$op" +: s"#rows=$rows" +: extraHeaders) ++ all, Seq(sub))
  }

  /** Rows written into `version`'s own fresh files (from the `#rows=`
    * commit-stat header), -1 for manifests published before the header
    * existed. For an append this is the delta row count; for a
    * rewrite/delete it is the republished file content.
    */
  def rowsWritten(table: String, version: Int): Long =
    manifestLines(table, version).collectFirst {
      case l if l.startsWith("#rows=") => l.stripPrefix("#rows=").toLong
    }.getOrElse(-1L)

  /** Highest streaming batch id ever published into `table`, walking
    * back from the latest version until an ingest (`#batch=`-headed)
    * manifest is found — maintenance versions (rewrite/vacuum/delete)
    * interleave without batch headers and must not mask the high-water
    * mark. Cost ∝ versions since the last ingest, not table size.
    */
  def lastBatchId(table: String): Option[Long] = {
    var v = latestVersion(table)
    while (v > 0) {
      val b = manifestLines(table, v).collectFirst {
        case l if l.startsWith("#batch=") => l.stripPrefix("#batch=").toLong
      }
      if (b.isDefined) return b
      v -= 1
    }
    None
  }

  /** EXACTLY-ONCE streaming append — the foreachBatch contract: publish
    * `df` as a new version whose manifest records `batchId`, unless a
    * version with this (or a later) batch id is already published, in
    * which case the call is a NO-OP returning None. Spark re-delivers a
    * micro-batch under the SAME batch id when the sink failed before
    * the checkpoint committed, so idempotence on batch id is exactly
    * what turns at-least-once delivery into an exactly-once table.
    * The publish itself is the CAS hard-link: when a racing duplicate
    * delivery loses the race, the loser re-checks the high-water mark
    * and degrades to the no-op instead of surfacing the conflict.
    */
  def appendBatch(df: DataFrame, table: String,
      batchId: Long): Option[Int] = {
    if (lastBatchId(table).exists(_ >= batchId)) return None
    val cur = latestVersion(table)
    try Some(publish(df, table, Some(cur), carryForward = true,
      extraHeaders = Seq(s"#batch=$batchId")))
    catch {
      case e: IllegalStateException =>
        if (lastBatchId(table).exists(_ >= batchId)) None else throw e
    }
  }

  /** Commit history — DESCRIBE HISTORY for the snapshot table: one row
    * per version with the op kind, file count, delta row count, and the
    * ingest batch id where one was recorded. Reads only manifests
    * (headers + file-list length), never data.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    (1 to latestVersion(table)).map { v =>
      val batch = manifestLines(table, v).collectFirst {
        case l if l.startsWith("#batch=") => l.stripPrefix("#batch=").toLong
      }
      (v, opKind(table, v), manifestFiles(table, v).size.toLong,
        rowsWritten(table, v), batch)
    }.toDF("version", "op", "n_files", "rows_written", "batch_id")
  }

  /** Write `df`'s rows as version-`next`-unique fresh files; returns the
    * data subdirectory name and the manifest-relative file paths.
    */
  private def writeData(df: DataFrame, table: String,
      next: Int): (String, Seq[String]) = {
    val dataDir = Paths.get(table, "data")
    Files.createDirectories(dataDir)
    Files.createDirectories(manifestDir(table))
    val sub = s"v$next-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(dataDir.resolve(sub).toString)
    val s = Files.list(dataDir.resolve(sub))
    val fresh =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
        .map(f => s"data/$sub/$f")
      finally s.close()
    (sub, fresh)
  }

  /** CAS publication point: stage the manifest lines to a temp name,
    * publish via atomic hard-link creation. Hard-link, not rename:
    * rename(2) silently REPLACES an existing target, so two racing
    * writers would both "succeed" and one version would vanish; link(2)
    * fails with EEXIST atomically, making publication single-winner.
    * The loser's staged tmp AND its freshly written data subdirectories
    * (`ownedSubs`) are removed — without the data cleanup, lost-race
    * parquet is referenced by no manifest ever, so vacuum's
    * manifest-set arithmetic can never reclaim it and retries leak disk
    * invisibly. The conflict then surfaces as an error the caller
    * retries from a fresh `latestVersion` (the optimistic-concurrency
    * loop production formats run).
    */
  private def publishManifest(table: String, next: Int,
      lines: Seq[String], ownedSubs: Seq[String]): Int = {
    val tmp = manifestDir(table).resolve(
      s"v$next-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    val target = manifestDir(table).resolve(s"v$next.list")
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        ownedSubs.foreach(sub => graft.util.Scratch.deleteTree(
          Paths.get(table, "data").resolve(sub)))
        throw new IllegalStateException(
          s"concurrent append lost the race for version $next of $table" +
            " — re-read latestVersion and retry")
    }
    Files.deleteIfExists(tmp)
    next
  }

  /** Row-level DELETE — the GDPR/compliance path: publish a new version
    * whose manifest swaps every file CONTAINING a matching row for a
    * rewritten copy holding only that file's surviving rows; untouched
    * files carry forward by reference. Cost ∝ matching files, never
    * table size: the affected-file scan reads only the predicate's
    * columns (pushdown applies), and only affected files are rewritten.
    * The predicate is recorded in the manifest header so
    * [[readDeletes]] can replay exactly which rows this version erased.
    * Time travel to pre-delete versions still serves the deleted rows
    * until [[vacuum]] physically reclaims the swapped-out files —
    * retention policy, not the delete, is what erases bytes (same
    * contract as Delta/Iceberg).
    *
    * A predicate matching nothing still publishes a version (same file
    * list, op recorded) — compliance wants the attempt in the log.
    * Returns the published version.
    */
  def delete(spark: SparkSession, table: String, predicate: String,
      expectedVersion: Option[Int] = None): Int = {
    import org.apache.spark.sql.functions.{col, expr, input_file_name}
    val current = expectedVersion.getOrElse(latestVersion(table))
    require(current > 0, s"table $table has no published versions")
    val next = current + 1
    val files = manifestFiles(table, current)
    // manifest-relative path keyed by its version-unique "sub/name"
    // suffix — input_file_name() returns a URI whose prefix varies by
    // filesystem, but the last two segments are unique by construction
    val bySuffix = files.map(rel =>
      rel.split('/').takeRight(2).mkString("/") -> rel).toMap
    val abs = files.map(rel => Paths.get(table).resolve(rel).toString)
    val affected = spark.read.parquet(abs: _*)
      .filter(expr(predicate))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))                // ∝ file count, bounded
      .map(uri => bySuffix(uri.split('/').takeRight(2).mkString("/")))
      .toSet
    val header = "#op=delete|" + java.util.Base64.getEncoder
      .encodeToString(predicate.getBytes("UTF-8"))
    if (affected.isEmpty)
      return publishManifest(table, next,
        Seq(header, "#rows=0") ++ files, Seq.empty)
    val keepAbs = affected.toSeq.sorted
      .map(rel => Paths.get(table).resolve(rel).toString)
    val survivors = spark.read.parquet(keepAbs: _*)
      .filter(!expr(predicate) || expr(predicate).isNull)
    val (sub, fresh) = writeData(survivors, table, next)
    val rows =
      if (fresh.isEmpty) 0L
      else spark.read.parquet(
        fresh.map(f => Paths.get(table).resolve(f).toString): _*).count()
    val all = files.filterNot(affected) ++ fresh
    publishManifest(table, next,
      Seq(header, s"#rows=$rows") ++ all, Seq(sub))
  }

  /** Rows a `delete` version REMOVED — the deletion side of the change
    * feed: re-read the files the delete swapped OUT of the manifest
    * (cost ∝ affected files) and filter by the predicate the manifest
    * recorded. Incremental consumers apply [[readChanges]] for adds and
    * this for retractions.
    */
  def readDeletes(spark: SparkSession, table: String,
      version: Int): DataFrame = {
    import org.apache.spark.sql.functions.expr
    require(opKind(table, version) == "delete",
      s"v$version of $table is a ${opKind(table, version)}, not a delete")
    val pred = deletePredicate(table, version).get
    val removed = manifestFiles(table, version - 1).toSet --
      manifestFiles(table, version).toSet
    val base = read(spark, table, Some(version))
    if (removed.isEmpty) return base.limit(0).filter(expr(pred))
    spark.read.parquet(removed.toSeq.sorted
        .map(rel => Paths.get(table).resolve(rel).toString): _*)
      .filter(expr(pred))
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
    // the manifest-set-difference delta is only the ADDED rows when
    // every version in the span is an append: a rewrite republishes the
    // whole table as fresh files (the difference would double-count
    // every pre-existing row as "new"), and a delete's rewritten
    // survivor files would likewise surface as adds. Fail with the
    // span's first offending version instead of silently over-reporting
    // — the consumer re-syncs from a post-rewrite baseline.
    ((fromVersion + 1) to toVersion).foreach { v =>
      val op = opKind(table, v)
      require(op == "append",
        s"change-feed span v$fromVersion..v$toVersion of $table crosses" +
          s" a $op at v$v — re-baseline the consumer at v$v instead")
    }
    val before =
      if (fromVersion == 0) Set.empty[String]
      else manifestFiles(table, fromVersion).toSet
    val added = manifestFiles(table, toVersion).filterNot(before)
    // a genuinely empty delta (appends of zero files) is an answer, not
    // an error: an incremental consumer polling an idle table expects
    // an empty frame with the table's schema
    if (added.isEmpty) return read(spark, table, Some(toVersion)).limit(0)
    spark.read.parquet(
      added.map(rel => Paths.get(table).resolve(rel).toString): _*)
  }
}
