package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out building blocks: bucketed co-located joins and skew salting.
  * These are the knobs a 100 TB deployment turns when the default
  * shuffle-everything plan stops being acceptable.
  */
object Scale {

  /** Persist a frame bucketed by join key. Two tables bucketed the same way
    * (same key, same bucket count) join WITHOUT a shuffle on either side —
    * at repeated-join scale this amortizes one write-time shuffle across
    * every subsequent join. (Spark managed-table bucketing; the lake analog
    * of co-partitioned storage.)
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 32, sortByKey: Boolean = true): Unit = {
    val spark = df.sparkSession
    // idempotent across JVMs: with an in-memory catalog, a table location
    // left by a PREVIOUS session isn't overwritable (the catalog has no
    // entry for it) — drop the entry if present and clear the stale path
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val w = df.write.mode("overwrite").bucketBy(nBuckets, key)
    (if (sortByKey) w.sortBy(key) else w).saveAsTable(table)
  }

  /** A two-phase (salted) aggregate: `partial` runs per (key, salt) group,
    * `merge` combines partials per key and must reference the partial by its
    * `name` (e.g. `TwoPhase("s", sum($"v"), sum($"s"))`). Only decomposable
    * aggregates fit (sum/count/min/max and combinations); derive avg as
    * sum/count after merging.
    */
  case class TwoPhase(name: String, partial: Column, merge: Column)

  object TwoPhase {
    def sumOf(name: String, c: Column): TwoPhase =
      TwoPhase(name, sum(c), sum(col(name)))
    def countAll(name: String): TwoPhase =
      TwoPhase(name, count(lit(1)), sum(col(name)))
    def minOf(name: String, c: Column): TwoPhase =
      TwoPhase(name, min(c), min(col(name)))
    def maxOf(name: String, c: Column): TwoPhase =
      TwoPhase(name, max(c), max(col(name)))
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1 aggregates
    * (key, salt) so a hot key's rows spread over `nSalts` reducers; phase 2
    * merges the partials per key. (Spark's hash aggregate already partial-
    * aggregates map-side; salting additionally splits a hot REDUCER key —
    * use it when one group receives a pathological share of rows.)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], nSalts: Int,
      aggs: Seq[TwoPhase]): DataFrame = {
    val salted = df.withColumn("__salt", deterministicSalt(df, nSalts))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head.partial.as(aggs.head.name),
        aggs.tail.map(a => a.partial.as(a.name)): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge.as(aggs.head.name),
        aggs.tail.map(a => a.merge.as(a.name)): _*)
  }

  /** Salted broadcast-free join for one hot build-side key set: the small
    * side is replicated `nSalts`× with an explicit salt, the big side draws
    * a random salt — a hot key's probe rows land on `nSalts` tasks instead
    * of one. Use when AQE skew-join splitting isn't available (e.g. a
    * non-AQE-visible skew after a transform).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      deterministicSalt(big, nSalts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key SPLIT join — the other classic skew defense ([[saltedJoin]]
    * spreads a hot key over salts; this one routes hot keys around the
    * shuffle entirely): count fact rows per key, call keys at or above
    * `hotThreshold` hot, then join the hot slice against the (broadcast)
    * hot slice of the dimension while the cold remainder takes the
    * normal shuffle join, and union the legs. At 100 TB the hot-key SET
    * is small by construction (there are only so many keys a skewed
    * distribution can make hot) so both broadcasts are tiny even when
    * the hot ROWS are a large fraction of the fact — the hot rows never
    * enter an exchange at all, which beats salting when skew is extreme
    * (salting still shuffles every hot row once). AQE's skew-join
    * mitigation approximates this at runtime per-partition; the explicit
    * form guarantees it regardless of partition statistics and composes
    * with pre-partitioned/bucketed cold paths. Result set is provably
    * the plain join's: the hot/cold key sets partition the key space and
    * each leg joins the SAME dimension rows the plain join would.
    */
  def hotKeySplitJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long): DataFrame = {
    require(hotThreshold > 0, s"hotThreshold must be > 0: $hotThreshold")
    val hotKeys = fact.groupBy(col(key)).count()
      .filter(col("count") >= hotThreshold).select(col(key))
    val factHot = fact.join(broadcast(hotKeys), Seq(key), "semi")
    val factCold = fact.join(broadcast(hotKeys), Seq(key), "anti")
    val dimHot = dim.join(broadcast(hotKeys), Seq(key), "semi")
    factHot.join(broadcast(dimHot), Seq(key))
      .unionByName(factCold.join(dim, Seq(key)))
  }

  /** Z-ordered parquet write: range-partition by the Morton code of two
    * dimensions ([[graft.functions.ZOrderCode]]) and sort within
    * partitions, so each output file covers a compact 2-D tile — parquet
    * row-group min/max statistics then prune range predicates on EITHER
    * dimension (the `OPTIMIZE ZORDER BY` layout, as an explicit operator).
    * Range partitioning makes the files' z-ranges disjoint (ScaleSpec
    * asserts this); at 100 TB this is a full shuffle paid ONCE at layout
    * time to cut every later scan.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
      bitsPer: Int = 16, nFiles: Int = 8): Unit = {
    import graft.functions.ZOrderCode.zorder_code
    df.withColumn("__z", zorder_code(col(colA), col(colB), bitsPer))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Grid-bucketed interval (range) join: each interval row is exploded
    * into the fixed-width time-grid cells its [start, end) span overlaps
    * (typically a handful), each event maps to its single cell, and the
    * containment predicate runs AFTER an equi-join on the cell id. The
    * naive inequality join has no equi-key, so Spark plans a broadcast
    * nested loop — O(|events| × |intervals|) comparisons at 100 TB; this
    * shape shuffles on cell ids, generates each candidate pair at most
    * once (an event has exactly one cell, and an interval's exploded cells
    * are distinct), so no post-join dedup is needed and candidates ∝ true
    * matches + same-cell near-misses. `gridSeconds` trades the interval
    * explode factor (long intervals → more cells) against candidate
    * precision (coarse grid → more near-misses); set it near the typical
    * interval length.
    */
  def intervalJoin(events: DataFrame, intervals: DataFrame, tsCol: String,
      startCol: String, endCol: String, gridSeconds: Long,
      maxCellsPerRow: Long = 65536L): DataFrame = {
    require(gridSeconds > 0, "gridSeconds must be positive")
    // integer DIV, not floor(a / b): double division of micro timestamps
    // can land a boundary value in the wrong cell
    val gUs = gridSeconds * 1000000L
    val ev = events.withColumn("__cell",
      expr(s"unix_micros(`$tsCol`) DIV ${gUs}L"))
    val spanCells = expr(s"(unix_micros(`$endCol`) - 1) DIV ${gUs}L") -
      expr(s"unix_micros(`$startCol`) DIV ${gUs}L")
    val iv = intervals
      // empty/inverted intervals ([start, end) with end <= start) match
      // nothing; drop them BEFORE the explode — sequence(a, b) with a > b
      // counts DOWN, which would fabricate a huge descending cell list
      // from a single corrupt row
      .filter(col(endCol) > col(startCol))
      // width circuit breaker (the hazard RangeJoinRewrite diverts to its
      // fallback branch): ONE valid but enormous interval makes sequence()
      // materialize span+1 cells — Spark's array-length limit or an OOM
      // deep inside the explode, hours in. Fail fast with an attributable
      // message instead; genuinely wide intervals belong on a coarser
      // grid (gridSeconds near the typical interval length) or on the
      // optimizer rule's nested-loop fallback.
      .filter(assert_true(spanCells < maxCellsPerRow,
        lit(s"intervalJoin: an interval spans >= $maxCellsPerRow grid " +
          s"cells at gridSeconds=$gridSeconds; use a coarser grid (or " +
          "RangeJoinRewrite, whose fallback handles pathological " +
          "intervals) instead of exploding it")).isNull)
      .withColumn("__cell",
        explode(sequence(expr(s"unix_micros(`$startCol`) DIV ${gUs}L"),
          expr(s"(unix_micros(`$endCol`) - 1) DIV ${gUs}L"))))
    ev.join(iv, Seq("__cell"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__cell")
  }

  /** Bloom-prefiltered semi join (an explicit runtime filter): build a
    * bounded-size bloom of the small side's keys
    * ([[graft.functions.BloomFilterAgg]] — a few KB regardless of key
    * count), pull that ONE row to the driver, prefilter the big side with
    * the codegen'd [[graft.functions.BloomMightContain]] INSIDE its scan
    * stage, then run the exact semi join over the survivors to drop bloom
    * false positives. At 100 TB the win is shuffle volume: the big side
    * ships only probable matches into the join exchange instead of every
    * row — the same mechanism as Spark's AQE runtime bloom filters, here
    * as a composable operator usable when the planner doesn't inject one
    * (e.g. the build side is itself a subquery the optimizer won't lift).
    * Keys must be BIGINT (hash wider keys first). Never drops a true
    * match: bloom filters have no false negatives, and null keys never
    * equi-join on either path.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    import graft.functions.BloomFilter._
    val bytes = small.agg(bloom_agg(col(key), numBits, numHashes))
      .collect()(0).getAs[Array[Byte]](0)
    // no distinct() on the build side: left_semi never duplicates probe
    // rows whatever the build side holds, so a pre-dedup is a wasted
    // aggregate+exchange
    big.filter(bloom_might_contain(col(key), bytes))
      .join(small.select(col(key)), Seq(key), "left_semi")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * size-targeted files. Streaming ingest (the reference's per-batch
    * archive flush, ParquetArchiver.java:96-103) leaves one small file
    * per micro-batch per partition; at lake scale that means millions of
    * KB-sized files — scan task explosion, tiny row groups, useless
    * min/max statistics. Compaction pays one read+shuffle+write to
    * restore ceil(totalBytes / targetFileBytes) round-robin-balanced
    * files (no keys: pure bin packing; use [[zorderWrite]] instead when a
    * sort-based layout should be restored at the same time). Returns the
    * file count written.
    */
  def compactFiles(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var total = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val nFiles = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes)
      .toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Salt derived by hashing the whole row, NOT `rand()`: a nondeterministic
    * expression feeding a shuffle key means a stage retry after a partial
    * shuffle-fetch failure can re-salt rows differently and double-count or
    * lose them. Hashing row content is retry-stable and spreads a hot key's
    * rows as long as they differ in any column.
    */
  private def deterministicSalt(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(nSalts.toLong))
}
