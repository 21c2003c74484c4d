package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Markup/boilerplate extraction — the CC/WET front step a training
  * pipeline runs BEFORE everything else in this repo (dedup, quality,
  * tokenization): strip script/style/comments, pick the main-content
  * region, drop tags, decode entities, collapse whitespace. Everything
  * is a chain of codegen'd built-ins (`regexp_replace` / `regexp_extract`
  * / `replace`) — a narrow per-row projection that fuses into the scan's
  * WholeStageCodegen span, zero shuffles; at 100 TB it runs at scan
  * speed, which is exactly what the first pass over raw crawl data must
  * do. Patterns are RE2-safe (no backreferences, no lookaround) so the
  * DuckDB oracle replays them verbatim.
  *
  * The reference pipeline has no markup step (its payloads are JSON
  * weather messages — see `Weather-Monitoring` SURVEY §3); this is
  * extension surface for the LLM-data workload, modeled on the
  * WET-extraction stage of public CC pipelines (trafilatura/jusText
  * class, reduced to the deterministic regex core so it is
  * cross-engine replayable).
  */
object Markup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** script/style blocks and comments vanish WITH their content (a
    * naive tag-strip would leak `var x=1<2;` as text); everything else
    * keeps its content. Alternation instead of a backreference keeps
    * the pattern RE2-valid for the oracle.
    */
  val DropBlockPattern: String =
    "(?s)(<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>|<!--.*?-->)"

  /** Chrome blocks the main-content FALLBACK removes when no
    * article/main region is declared: nav, header, footer, aside.
    */
  val BoilerplatePattern: String =
    "(?s)(<nav\\b[^>]*>.*?</nav>|<header\\b[^>]*>.*?</header>" +
      "|<footer\\b[^>]*>.*?</footer>|<aside\\b[^>]*>.*?</aside>)"

  private val TagPattern = "<[^>]+>"

  /** Minimal entity set, decoded AFTER tag-strip; `&amp;` is decoded
    * LAST so `&amp;lt;` becomes the literal `&lt;`, not `<` (the
    * standard double-decode guard).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (k, v)) =>
      call_function("replace", acc, lit(k), lit(v))
    }

  /** Tag-strip + entity decode + whitespace collapse over an
    * already-selected content region.
    */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(html, DropBlockPattern, " ")
    val noTags = regexp_replace(noBlocks, TagPattern, " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** Main-content heuristic: a declared `<article>` region wins, then
    * `<main>`, then the `<body>` (whole document if even that is
    * absent) with chrome blocks removed — the deterministic core of
    * what WET extractors do. Returns clean text.
    */
  def extractMain(html: Column): Column = {
    val art = regexp_extract(html, "(?s)<article\\b[^>]*>(.*?)</article>", 1)
    val mn = regexp_extract(html, "(?s)<main\\b[^>]*>(.*?)</main>", 1)
    val body = regexp_extract(html, "(?s)<body\\b[^>]*>(.*?)</body>", 1)
    val fallback = regexp_replace(
      when(length(body) > 0, body).otherwise(html), BoilerplatePattern, " ")
    stripMarkup(
      when(length(art) > 0, art)
        .when(length(mn) > 0, mn)
        .otherwise(fallback))
  }

  /** Deterministic "site A" wrapper for the gate fixture: every doc
    * gains a full page shell — title, style/script (whose content MUST
    * vanish, including the `1<2` that would poison a naive tag-strip),
    * per-doc nav and footer boilerplate — and the text rides in either
    * an `<article>` region or a bare `<p>` (doc_id ≡ 0 mod 3), so both
    * the declared-region path and the strip-the-chrome fallback carry
    * real rows. Entities in the payload exercise the decode order.
    */
  def wrapSiteA(docId: Column, text: Column): Column = {
    val payload = concat(lit("<p>"), coalesce(text, lit("")),
      lit(" &amp; tail &lt;ok&gt;</p>"))
    concat(
      lit("<html><head><title>d"), docId,
      lit("</title><style>p{margin:0}</style>" +
        "<script>var x=1<2;</script></head><body><nav>Home | Archive" +
        " | entry "), docId, lit("</nav>"),
      when(docId % 3 === 0, payload)
        .otherwise(concat(lit("<article>"), payload, lit("</article>"))),
      lit("<footer>&copy; 2026 entry "), docId,
      lit("</footer></body></html>"))
  }

  /** "Site B" wrapper — the SAME content syndicated under different
    * chrome (header/aside/main instead of nav/article): the classic
    * crawl-dedup scenario where raw bytes are all distinct and only
    * post-extraction content matches.
    */
  def wrapSiteB(docId: Column, text: Column): Column =
    concat(
      lit("<html><body><header>SiteB "), docId,
      lit("</header><main><p>"), coalesce(text, lit("")),
      lit(" &amp; tail &lt;ok&gt;</p></main><aside>ads "), docId,
      lit("</aside><footer>b-footer</footer></body></html>"))

  /** Gated per-doc extraction report: wrap each document in the site-A
    * shell, extract, and emit length + md5 of the clean text plus which
    * path ran — one mis-stripped tag, leaked script character, or
    * mis-decoded entity anywhere reds the row.
    */
  def extractReport(spark: SparkSession, dir: String): DataFrame = {
    val html = wrapSiteA(col("doc_id"), col("text"))
    docs(spark, dir).select(
      col("doc_id"),
      (col("doc_id") % 3 =!= 0).as("used_article"),
      length(extractMain(html)).as("n_chars"),
      md5(extractMain(html).cast("binary")).as("ex_md5"))
  }

  /** Composition gate: extraction → exact dedup. The corpus is
    * "syndicated" — every doc published once under site A and once
    * under site B chrome — so every RAW page is byte-distinct (doc_id
    * in the boilerplate, different shells), and only extraction can
    * recover the duplicate pairs. Groups by extracted-content md5:
    * every group must have ≥2 members (the two syndications, more where
    * the fixture itself holds exact dups), proven by count + doc_id
    * checksum per group. The raw-distinctness premise is asserted
    * in-plan: `n_raw_distinct` counts distinct raw-page hashes within
    * the group (= n_docs when no two wrapped pages collide).
    */
  def extractDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val a = d.select(col("doc_id"),
      wrapSiteA(col("doc_id"), col("text")).as("html"))
    val b = d.select((col("doc_id") + 1000000).as("doc_id"),
      wrapSiteB(col("doc_id"), col("text")).as("html"))
    a.unionAll(b)
      .select(col("doc_id"), col("html"),
        md5(extractMain(col("html")).cast("binary")).as("ex_md5"))
      .groupBy(col("ex_md5"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        sum(col("doc_id")).cast("long").as("sum_doc_id"),
        countDistinct(md5(col("html").cast("binary")))
          .as("n_raw_distinct"))
  }
}
