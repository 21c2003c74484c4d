package graft.ext.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling — the schema-sanity pass a pipeline runs on arrival:
  * per-column row count, null count, distinct count, min/max (rendered as
  * strings so heterogeneous column types share one report schema).
  *
  * One aggregate pass over the table; the per-column distinct counts make
  * Catalyst plan an Expand (one duplicated stream per distinct aggregate),
  * which is the standard exact shape. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` (HLL++, one pass, no Expand) — the report is
  * diagnostic, a 2 % estimate is fine there; the exact form is the gate.
  * The final `stack` reshape runs on the single aggregate row.
  */
object Profile {

  // the stack() expression is built from column names — quote the labels
  // and backtick the refs so names with spaces/quotes neither break the
  // parse nor inject into the generated expression
  private def label(c: String) =
    "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def ref(c: String) = "`" + c.replace("`", "``") + "`"

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // two aggregate passes on purpose: counts/distincts have long buffers
    // (HashAggregate over the distinct Expand), while min/max over string
    // columns only run as SortAggregate — kept in their own global
    // aggregate they need no Sort (empty grouping) and don't drag the
    // Expand stream through sort-based aggregation
    val countAggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"n_$c"),
        (count(lit(1)) - count(col(c))).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"))
    }
    val rangeAggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val wide = df.agg(countAggs.head, countAggs.tail: _*)
      .crossJoin(df.agg(rangeAggs.head, rangeAggs.tail: _*))
    val stackArgs = cols.map(c =>
      s"${label(c)}, ${ref(s"n_$c")}, ${ref(s"null_$c")}, " +
        s"${ref(s"dist_$c")}, ${ref(s"min_$c")}, ${ref(s"max_$c")}")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n, n_null, n_distinct, min_val, max_val)"))
  }

  /** Gated profile over lineitem's mixed-type columns. */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    profile(spark.read.parquet(s"$dir/lineitem.parquet"),
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"))

  /** The 100 TB profiling shape, gated: `approx_count_distinct` (HLL++,
    * relative error 0.02) runs in ONE aggregate pass with no Expand
    * stream — at scale the exact form's per-distinct-aggregate duplicated
    * streams are the cost that forces the approximation. The report pairs
    * each estimate with the exact count as a within-5 % boolean, so the
    * gate PROVES the estimator's accuracy on real columns (including a
    * high-cardinality key) instead of just documenting the swap; the
    * exact count anchors the oracle row.
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "approxProfile needs at least one column")
    // two aggregate passes ON PURPOSE: the HLL sketches must not ride the
    // exact pass's Expand stream (4 distinct aggregates expand every row
    // 5×; updating the sketches on the expanded stream multiplies their
    // per-row hashing the same way). Separated, the approx pass is the
    // production shape — ONE clean scan, no Expand — and the exact pass
    // exists only as the gate's anchor. Both are single-row results, so
    // the crossJoin is free.
    val exactAggs = cols.map(c => countDistinct(col(c)).as(s"dist_$c"))
    val apxAggs = cols.map(c =>
      approx_count_distinct(col(c), 0.02).as(s"apx_$c"))
    val wide = df.agg(exactAggs.head, exactAggs.tail: _*)
      .crossJoin(df.agg(apxAggs.head, apxAggs.tail: _*))
    val stackArgs = cols.map(c =>
      s"${label(c)}, ${ref(s"dist_$c")}, ${ref(s"apx_$c")}").mkString(", ")
    wide.select(expr(
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_distinct, apx)"))
      .select(col("col_name"), col("n_distinct"),
        // degenerate guard keeps the report total: an all-null/empty
        // column has n_distinct = 0 and the ratio would be null — an
        // estimator that also says 0 is exactly right, so say true
        when(col("n_distinct") === 0L, col("apx") === 0L)
          .otherwise(abs(col("apx") - col("n_distinct")).cast("double") /
            col("n_distinct").cast("double") <= 0.05)
          .as("approx_within_5pct"))
  }

  /** Gated approx profile over the same lineitem columns as
    * [[lineitemProfile]] (cardinalities from 1-digit to row-count scale).
    */
  def lineitemApproxProfile(spark: SparkSession, dir: String): DataFrame =
    approxProfile(spark.read.parquet(s"$dir/lineitem.parquet"),
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"))

  /** Key-skew diagnostic — the report you read BEFORE sizing a salted
    * aggregate or expecting AQE's skew-join to save a shuffle: per-key row
    * counts bucketed on a power-of-two ladder (how many keys carry 1 row,
    * 2–3, 4–7, …), plus each bucket's row mass and its hottest key's
    * count. One map-side-combined aggregate over (key) then a 21-row
    * reduction — nothing driver-side, nothing ∝ distinct keys beyond the
    * first aggregate's shuffle. The ladder is an integer CASE chain, not
    * `floor(log2(...))`: libm logs are not correctly rounded and a
    * one-ulp wobble at an exact power of two would flip a bucket — the
    * CASE form is bit-deterministic on every engine.
    */
  def skewReport(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val ladder = (1 to 20).foldLeft(when(col("cnt") < 2L, 0)) {
      case (acc, b) => acc.when(col("cnt") < (1L << (b + 1)), b)
    }.otherwise(21)
    counts
      .select(ladder.as("log2_bucket"), col("cnt"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_key_rows"))
  }

  /** Gated skew report over the order-lines-per-order distribution. */
  def lineitemSkewReport(spark: SparkSession, dir: String): DataFrame =
    skewReport(spark.read.parquet(s"$dir/lineitem.parquet"), "l_orderkey")
}
