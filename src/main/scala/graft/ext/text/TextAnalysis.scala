package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash.poly_hash

/** Text-analysis operators for the training-data pipeline: token counting,
  * quality scoring, language ID, document fingerprinting. All are narrow
  * per-row projections over codegen'd built-ins (split/filter/transform/
  * regexp) plus the custom [[graft.functions.PolyHash]] expression — no
  * shuffles, no UDFs; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  def tokens(text: Column): Column = split(trim(text), " ")

  /** BPE-ish lexer token count: words, digit runs, and individual
    * punctuation, via one regexp pass (same pattern as the DuckDB oracle).
    */
  val LexerPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Token counting: whitespace tokens + lexer tokens per document. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(LexerPattern), lit(0)))
        .as("n_lexer_tokens"))

  /** Quality scoring: length, token stats, stopword ratio, uppercase/punct
    * ratios, distinct-token ratio — the usual pretraining-filter features.
    * Ratios rounded to 4 for cross-engine hash stability.
    */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val t = tokens(col("text"))
    val nTok = size(t)
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      nTok.as("n_tokens"),
      round(size(filter(t, x => x.isin(stop: _*))).cast("double") / nTok, 4)
        .as("stopword_ratio"),
      round(size(array_distinct(t)).cast("double") / nTok, 4)
        .as("distinct_ratio"),
      round(size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .cast("double") / length(col("text")), 4).as("punct_ratio"),
      round(length(regexp_replace(col("text"), "[^ ]", "")).cast("double")
        / length(col("text")), 4).as("space_ratio"))
  }

  /** Language ID by marker-token counting: score each candidate language by
    * occurrences of its high-frequency function words, predict the argmax
    * (ties broken by language code). A classic n-gram/stopword heuristic —
    * no model download, deterministic, embarrassingly parallel.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"))

  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(lower(col("text")))
    def score(lang: String): Column =
      size(filter(t, x =>
        LangMarkers(lang).map(m => x === m).reduce(_ || _)))
    val scored = docs(spark, dir).select(
      col("doc_id"), col("lang").as("declared_lang"),
      score("en").as("n_en"), score("de").as("n_de"),
      score("es").as("n_es"), score("fr").as("n_fr"))
    // argmax with deterministic tie-break on language code order de<en<es<fr
    scored.withColumn("pred_lang",
      when(col("n_de") >= greatest(col("n_en"), col("n_es"), col("n_fr")), "de")
        .when(col("n_en") >= greatest(col("n_es"), col("n_fr")), "en")
        .when(col("n_es") >= col("n_fr"), "es")
        .otherwise("fr"))
  }

  /** Document fingerprinting with the custom codegen'd PolyHash expression —
    * content-addressable id for exact-dup detection and incremental reindex.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      poly_hash(col("text")).as("fingerprint"),
      poly_hash(lower(regexp_replace(col("text"), "\\s+", " ")))
        .as("normalized_fingerprint"))
}
