package graft.ext.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-shaped
  * (Schelter et al., VLDB 2018, "Automating Large-Scale Data Quality
  * Verification") arrival gate a pipeline runs before letting a batch
  * into the lake: a list of constraints compiled into ONE aggregate
  * pass over the table, plus one anti-join per referential constraint,
  * reported as `(check_name, violations, passed)`.
  *
  * Scale contract: every row-local constraint (not-null, in-set, range,
  * uniqueness, min-rows) becomes one aggregate `Column` in a single
  * global aggregate — one scan, map-side combined, a 1-row result; the
  * report never carries data rows, only violation COUNTS. Uniqueness
  * rides the same pass as a distinct aggregate (Catalyst plans the
  * standard Expand; at 100 TB swap to `approx_count_distinct` when the
  * check is a drift alarm rather than a hard gate — same report shape).
  * Referential checks are LEFT ANTI joins that reduce to a count before
  * anything crosses back — the violating rows themselves stay
  * distributed, broadcastable whenever the referenced key set is a
  * dimension. All results are 1-row, so the final assembly cross-joins
  * for free and `stack`s on a single row.
  */
object Quality {

  /** One declarative constraint; `name` keys the report row. */
  sealed trait Check { def name: String }

  /** Column must never be null. */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null($column)"
  }

  /** The column tuple must be row-unique. Violations = rows beyond the
    * first per duplicate tuple (`count(*) - count(DISTINCT tuple)`), so
    * a clean table scores 0. Counted over a `struct` so tuples with
    * null fields still count as values (DuckDB's `ROW()` semantics),
    * not dropped the way a bare multi-column `count(DISTINCT a, b)`
    * would.
    */
  final case class Unique(columns: Seq[String]) extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Column value must be one of `values`; null is a violation (an
    * enum column with no value is dirty, not vacuously valid). */
  final case class InSet(column: String, values: Seq[String])
      extends Check {
    def name = s"in_set($column)"
  }

  /** Column must lie in [lo, hi]; null is a violation. */
  final case class Between(column: String, lo: Double, hi: Double)
      extends Check {
    def name = s"between($column,$lo,$hi)"
  }

  /** Table must have at least `n` rows; violations = the shortfall. */
  final case class MinRows(n: Long) extends Check {
    def name = s"min_rows($n)"
  }

  /** Every (non-null) value of `column` must exist in
    * `ref(refColumn)` — referential integrity; `refName` labels the
    * referenced table in the report. Null FK values count as
    * violations (they match nothing, same as SQL `NOT EXISTS`).
    * `broadcastRef = true` (the common case: the referenced keyset is
    * a dimension) GUARANTEES the key set broadcasts so the fact side
    * never enters an exchange for this check — at gate SF the AQE
    * planner already chooses broadcast (listener-measured: the gate's
    * remaining 456k shuffle records are entirely the Unique check's
    * distinct aggregate), but at 100 TB misleading stats must not be
    * able to flip a FK audit into a fact-table shuffle; leave false
    * when the referenced keyset is itself fact-sized and must shuffle.
    */
  final case class SubsetOf(column: String, ref: DataFrame,
      refColumn: String, refName: String,
      broadcastRef: Boolean = false) extends Check {
    def name = s"subset_of($column,$refName.$refColumn)"
  }

  private def rowLocalAgg(c: Check): Option[Column] = c match {
    case NotNull(col0) =>
      Some(count(lit(1)) - count(col(col0)))
    case Unique(cols) =>
      Some(count(lit(1)) - countDistinct(struct(cols.map(col): _*)))
    case InSet(col0, vs) =>
      Some(count(when(col(col0).isNull ||
        !col(col0).isin(vs: _*), lit(1))))
    case Between(col0, lo, hi) =>
      Some(count(when(col(col0).isNull ||
        col(col0) < lo || col(col0) > hi, lit(1))))
    case MinRows(n) =>
      Some(greatest(lit(0L), lit(n) - count(lit(1))))
    case _: SubsetOf => None
  }

  /** Evaluate `checks` over `df`; returns one row per check:
    * `(check_name STRING, violations BIGINT, passed BOOLEAN)` where
    * `passed = (violations == 0)`.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val local = checks.zipWithIndex.flatMap { case (c, i) =>
      rowLocalAgg(c).map(a => a.cast("long").as(s"v_$i"))
    }
    val localRow: Option[DataFrame] =
      if (local.isEmpty) None
      else Some(df.agg(local.head, local.tail: _*))
    val refRows: Seq[DataFrame] = checks.zipWithIndex.collect {
      case (SubsetOf(col0, ref, refCol, _, bcast), i) =>
        // no distinct(): the anti join ignores key multiplicity, and a
        // pre-dedup would cost its own shuffle — the broadcast hash
        // table dedups for free
        val keys = ref.select(col(refCol).as(col0))
        df.select(col(col0))
          .join(if (bcast) broadcast(keys) else keys, Seq(col0),
            "left_anti")
          .agg(count(lit(1)).cast("long").as(s"v_$i"))
    }
    val wide = (localRow.toSeq ++ refRows).reduce(_.crossJoin(_))
    val stackArgs = checks.zipWithIndex.map { case (c, i) =>
      s"'${c.name.replace("'", "\\'")}', v_$i"
    }.mkString(", ")
    wide
      .select(expr(s"stack(${checks.length}, $stackArgs) AS " +
        "(check_name, violations)"))
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Table reconciliation — the migration audit "did the rewrite
    * preserve the data": a FULL OUTER join of two table versions on the
    * key columns classifies every key as `removed` (gone from b),
    * `added` (new in b), `changed` (payload differs — null-safe struct
    * compare, so a null-vs-value flip counts as a change, not a match),
    * or `unchanged`. One join on the keys; payloads travel as single
    * structs so the comparison is one codegen'd equality regardless of
    * column count. At 100 TB both sides shuffle once on the key (or not
    * at all when both are bucketed by it) and the row-level verdicts
    * reduce to per-group counts before anything returns.
    */
  /** `carry` columns (a subset of `payload`) are projected out of the
    * joined structs via `coalesce(a.c, b.c)` — label columns for the
    * report, recovered from the join that already has them in hand
    * rather than re-joined afterwards.
    */
  def tableDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
      payload: Seq[String], carry: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && payload.nonEmpty,
      "tableDiff needs key and payload columns")
    require(carry.forall(payload.contains),
      s"carry columns must be payload columns: $carry")
    def pack(df: DataFrame, side: String) =
      df.select(keys.map(col) :+
        struct(payload.map(col): _*).as(s"__p_$side"): _*)
    pack(a, "a").join(pack(b, "b"), keys, "full_outer")
      .select(keys.map(col) ++
        carry.map(c =>
          coalesce(col(s"__p_a.$c"), col(s"__p_b.$c")).as(c)) :+
        when(col("__p_b").isNull, "removed")
          .when(col("__p_a").isNull, "added")
          .when(col("__p_a") <=> col("__p_b"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  /** Gated [[tableDiff]] over a deterministic mutation of events: the
    * revised table drops every 7th key, bumps the cents payload on
    * every 5th, and adds a fresh negated-key slice — so all four
    * verdicts appear with nontrivial counts, rolled up per
    * (event_type, status).
    */
  def eventsDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val revised = ev.filter(col("event_id") % 7 =!= 0)
      .withColumn("cents",
        when(col("event_id") % 5 === 0, col("cents") + 100)
          .otherwise(col("cents")))
      .unionByName(ev.filter(col("event_id") % 11 === 0)
        .select((-col("event_id") - 1).as("event_id"),
          col("event_type"), col("cents")))
    tableDiff(ev, revised, Seq("event_id"), Seq("event_type", "cents"),
        carry = Seq("event_type"))
      .groupBy(col("event_type"), col("status"))
      .agg(count(lit(1)).as("n"))
  }

  /** Order-independent partition checksums — the replica-comparison
    * primitive [[tableDiff]] can't be: comparing two copies of a table
    * that live on DIFFERENT clusters can't join them; instead each side
    * independently reduces every partition to `(n, xor48)` — row count
    * plus the XOR of a portable 48-bit md5 row hash — and only the tiny
    * checksum tables travel. XOR is commutative/associative with no
    * overflow, so the checksum is invariant to row order and
    * partitioning; the count guards XOR's one blind spot (duplicate row
    * PAIRS cancel to 0 — equal counts + equal xor is the practical
    * anti-entropy check, not a cryptographic one). Payload columns are
    * canonicalized as strings with a null sentinel; keep payloads to
    * integers/strings — float-to-string rendering is engine-specific.
    */
  def partitionChecksums(df: DataFrame, keys: Seq[String],
      payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty && payload.nonEmpty,
      "partitionChecksums needs key and payload columns")
    val canon = concat_ws("\u0001",
      payload.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val h48 = expr(
      s"CAST(conv(substring(md5(${canonAlias}), 1, 12), 16, 10) AS BIGINT)")
    df.select(keys.map(col) :+ canon.as(canonAlias): _*)
      .select(keys.map(col) :+ h48.as("__h"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(__h)").cast("long").as("xor48"))
  }
  private val canonAlias = "__canon"

  /** Gated [[partitionChecksums]] over events per (event_type, date) —
    * the per-day-per-type cells a replication audit actually compares.
    */
  def eventsChecksums(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.util.EventTs.readEvents(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("event_id"), col("user_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    partitionChecksums(ev, Seq("event_type", "d"),
      Seq("event_id", "user_id", "cents"))
  }

  /** Gated suite over lineitem (+ orders for the FK): mixes passing and
    * FAILING constraints — the synthetic lineitem's `(l_orderkey,
    * l_linenumber)` pair is genuinely dirty (duplicate line numbers
    * within an order) and quantities run to 50, so `unique` and the
    * tight `between` report real nonzero violation counts while the
    * not-null / enum / discount-range / row-count / referential checks
    * pass. Both report outcomes are exercised against real data.
    */
  def lineitemChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    validate(li, Seq(
      NotNull("l_orderkey"),
      Unique(Seq("l_orderkey", "l_linenumber")),
      InSet("l_returnflag", Seq("A", "N", "R")),
      Between("l_discount", 0.0, 0.1),
      Between("l_quantity", 1.0, 10.0),
      MinRows(1000L),
      SubsetOf("l_orderkey", ord, "o_orderkey", "orders",
        broadcastRef = true)))
  }
}
