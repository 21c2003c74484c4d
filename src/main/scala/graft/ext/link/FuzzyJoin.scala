package graft.ext.link

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy (approximate-string) self-join for record linkage / entity
  * resolution — the "same real-world entity, slightly different spelling"
  * step of data integration, and a deduplication primitive the text-dedup
  * family (shingle/minhash over DOCUMENTS) does not cover: short KEY
  * strings, where edit distance — not set overlap — is the right metric.
  *
  * Candidate generation is FastSS deletion-neighborhood indexing (Bocek
  * et al. 2007, "Fast Similarity Search in Large Dictionaries"): each
  * string s expands to {s} ∪ {s with position i deleted}. Any two strings
  * within Levenshtein distance 1 — substitution, insertion, OR deletion —
  * share at least one variant (substitution at i: both i-deletions
  * coincide; insertion: the shorter string equals one deletion of the
  * longer; equality: the strings themselves), so the variant equi-join is
  * a COMPLETE candidate generator at distance ≤ 1, with no quadratic
  * blocking hazard: a hot prefix shared by every record (the classic
  * blocking failure — all "Customer#…" rows in one block) adds nothing,
  * because variants differ wherever the strings do. Candidates are then
  * exact-verified with `levenshtein` (precision 1.0; hash collisions on
  * the shuffled 8-byte variant key only ever ADD candidates, never lose
  * one).
  *
  * The depth generalizes (FastSS proper): `maxDist = k` indexes the
  * up-to-k-deletion neighborhood — Bocek et al.'s lemma gives that two
  * strings within edit distance k share a common member of their
  * k-deletion neighborhoods, so the same variant equi-join stays a
  * complete candidate generator at any k; variant count per key grows as
  * Σ C(len, j), j ≤ k (len+1 at k=1, +C(len,2) at k=2), and bucket
  * sizes grow with the neighborhood radius — k is the recall/cost dial.
  *
  * Scale shape: the explode is the per-row variant count — shuffle
  * volume ∝ corpus × C(key length, k), each key an 8-byte xxhash64,
  * never the record payload; bucket sizes are ∝ true neighborhoods (no
  * corpus-sized block), and the verify join touches candidates only.
  * The oracle's all-pairs form is the yardstick, quadratic by
  * construction — the gates bound ITS cost with deterministic key
  * slices, same policy as the kNN gates.
  */
object FuzzyJoin {

  /** All single-position deletions of `s` (without `s` itself). */
  private def deletions1(s: Column): Column =
    transform(sequence(lit(1), length(s)),
      // suffix length = full string length: always >= the remainder, so
      // no key length can truncate a variant (a fixed cap would silently
      // break candidate completeness for keys longer than it)
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))

  /** Every two-position deletion of `s` (i < j): chars [1,i-1] ++
    * [i+1,j-1] ++ [j+1,len]. Empty when len < 2.
    */
  private def deletions2(s: Column): Column =
    flatten(transform(sequence(lit(1), length(s) - 1), i =>
      transform(sequence(i + 1, length(s)), j =>
        concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, j - i - 1),
          s.substr(j + 1, length(s))))))

  /** The up-to-`maxDist`-deletion neighborhood of `s`, itself included. */
  private def deletionVariants(s: Column, maxDist: Int): Column =
    maxDist match {
      case 1 => concat(array(s), deletions1(s))
      case 2 => concat(array(s), deletions1(s),
        when(length(s) >= 2, deletions2(s))
          .otherwise(array().cast("array<string>")))
    }

  /** Pairs of records whose `name` strings are within Levenshtein
    * distance `maxDist` (1 or 2), as `(a_key, b_key, dist)` with
    * `a_key < b_key`.
    */
  def nearKeyPairs(records: DataFrame, keyCol: String,
      nameCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion neighborhoods implemented for maxDist 1 or 2: $maxDist")
    val v = records
      .filter(col(nameCol).isNotNull)
      .select(col(keyCol).as("k"), col(nameCol).as("n"))
      .select(col("k"), col("n"),
        explode(deletionVariants(col("n"), maxDist)).as("variant"))
      .select(col("k"), col("n"), xxhash64(col("variant")).as("vh"))
    val a = v.select(col("k").as("a_key"), col("n").as("a_name"),
      col("vh"))
    val b = v.select(col("k").as("b_key"), col("n").as("b_name"),
      col("vh"))
    a.join(b, Seq("vh"))
      .filter(col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"))
      .distinct() // a pair may share several variants (e.g. equal names)
      .select(col("a_key"), col("b_key"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Gate entry: near-duplicate customer names on a deterministic 1-in-5
    * key slice (the all-pairs ORACLE is the quadratic side; the slice is
    * its cost dial — the FastSS path itself is linear in the corpus).
    */
  def customerNameDups(spark: SparkSession, dir: String,
      every: Long = 5L): DataFrame =
    nearKeyPairs(
      spark.read.parquet(s"$dir/customer.parquet")
        .filter(pmod(col("c_custkey"), lit(every)) === 0L),
      "c_custkey", "c_name")

  /** Gate entry for the depth-2 neighborhood: distance ≤ 2 pairs on a
    * deterministic 1-in-40 slice — the ≤ 2 result set is an order of
    * magnitude denser than ≤ 1 (two free digit positions) and dist-1
    * pairs duplicate across ~len shared variants, so the slice keeps the
    * oracle's quadratic side, the candidate-join volume, and the RESULT
    * row count proportionate.
    */
  def customerNameDups2(spark: SparkSession, dir: String): DataFrame =
    nearKeyPairs(
      spark.read.parquet(s"$dir/customer.parquet")
        .filter(pmod(col("c_custkey"), lit(40L)) === 0L),
      "c_custkey", "c_name", maxDist = 2)

  /** Entity resolution end to end: the fuzzy pairs are EDGES, and
    * transitively linked records are one real-world entity — exactly the
    * dedup-cluster problem, so the same distributed connected-components
    * machinery ([[graft.ext.dedup.TextDedup.connectedComponents]], the
    * iterative min-label/star rules — no driver-side graph) resolves
    * them; the report pins each multi-record entity's exact membership
    * (`entity_id` = min member key, `sum_keys` the membership checksum).
    * Records with no near-duplicate form singleton entities and are not
    * reported. Spec-proven, deliberately NOT a driver gate: over uniform
    * serial names the digit-substitution graph percolates into one giant
    * component, so the gate form would pay several CC rounds for a 1-row
    * degenerate answer while [[graft.ext.dedup.TextDedup]]'s three
    * cluster gates already oracle the CC machinery on richer graphs; the
    * composition itself (edges complete at lev ≤ 1 + exact transitive
    * closure) is pinned by `FuzzyJoinSpec`.
    */
  def customerEntities(spark: SparkSession, dir: String): DataFrame =
    entities(
      spark.read.parquet(s"$dir/customer.parquet")
        .filter(pmod(col("c_custkey"), lit(10L)) === 0L),
      "c_custkey", "c_name")

  /** [[nearKeyPairs]] edges resolved into multi-record entities via
    * distributed connected components; see [[customerEntities]].
    */
  def entities(records: DataFrame, keyCol: String,
      nameCol: String): DataFrame = {
    val pairs = nearKeyPairs(records, keyCol, nameCol)
      .select(col("a_key").as("d1"), col("b_key").as("d2"))
    graft.ext.dedup.TextDedup.connectedComponents(pairs)
      .groupBy(col("label").as("entity_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("doc_id")).as("sum_keys"))
  }
}
