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
  * Scale shape: the explode is (len+1) variants per row — shuffle volume
  * ∝ corpus × key length, each key an 8-byte xxhash64, never the record
  * payload; bucket sizes are ∝ true neighborhoods (no corpus-sized
  * block), and the verify join touches candidates only. The oracle's
  * all-pairs form is the yardstick, quadratic by construction — the gate
  * bounds ITS cost with a deterministic 1-in-5 key slice, same policy as
  * the kNN gates. Distance > 1 generalizes by indexing deeper deletion
  * neighborhoods (FastSS proper); the gate runs the d ≤ 1 form.
  */
object FuzzyJoin {

  /** All deletion-neighborhood variants of `s`: itself plus each
    * single-position deletion.
    */
  private def deletionVariants(s: Column): Column =
    concat(array(s),
      transform(sequence(lit(1), length(s)),
        // suffix length = full string length: always >= the remainder, so
        // no key length can truncate a variant (a fixed cap would silently
        // break candidate completeness for keys longer than it)
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Pairs of records whose `name` strings are within Levenshtein
    * distance 1, as `(a_key, b_key, dist)` with `a_key < b_key`.
    */
  def nearKeyPairs(records: DataFrame, keyCol: String,
      nameCol: String): DataFrame = {
    val v = records
      .filter(col(nameCol).isNotNull)
      .select(col(keyCol).as("k"), col(nameCol).as("n"))
      .select(col("k"), col("n"),
        explode(deletionVariants(col("n"))).as("variant"))
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
      .filter(col("dist") <= 1)
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
