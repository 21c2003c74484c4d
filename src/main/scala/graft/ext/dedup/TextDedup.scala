package graft.ext.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.text.TextAnalysis.tokens

/** Deduplication operators for the training-data pipeline, in increasing
  * sophistication: exact (hash groupBy), n-gram Jaccard (exhaustive
  * shingle-join), MinHash+LSH (banded candidate generation + exact verify),
  * SimHash (bit-signature + hamming band join).
  *
  * Scale notes: the exhaustive shingle self-join is O(sum of bucket²) — fine
  * when shingles are selective, quadratic on hot shingles; MinHash/LSH is the
  * 100 TB path (candidates ∝ true near-dups, tunable via bands×rows). Both
  * funnel through the same exact-Jaccard verifier so results are comparable.
  * All hashing is xxhash64 — distributed, seeded, no driver state.
  */
object TextDedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Corpus-level repeated-line removal — the C4/RefinedWeb boilerplate
    * step: lines occurring in ≥ `minDocs` DISTINCT documents (nav bars,
    * footers, licence blurbs) are dropped from every document, and each
    * document is reassembled from its surviving lines in order. "Lines"
    * here are fixed `lineTokens`-token windows (the fixture has no layout
    * newlines; swapping the splitter for `split(text, '\n')` is the only
    * change for real web text).
    *
    * Shape at 100 TB: the canonical two-pass boilerplate budget — pass one
    * aggregates line document-frequency, pass two rewrites each document
    * with the (small, aggregated) hot-line set joined on as a marker; all
    * per-doc outputs (totals, kept count, reassembled text) come from ONE
    * final groupBy, so no third scan and no doc-vanishing edge. With
    * `hashKeys = false` the doc-frequency aggregate and marker join key on
    * the line STRING, which the DuckDB oracle replays exactly; with
    * `hashKeys = true` (the production shape, gated as
    * `x_dedup_lines_hashed`) they key on `xxhash64(line)` so every
    * shuffled key is 8 bytes regardless of line length — results are
    * identical modulo 64-bit hash collisions, which is why the
    * string-keyed oracle still verifies it (SCALE.md skew notes apply —
    * a boilerplate line IS a hot key, and the doc-frequency aggregate
    * partial-combines it map-side).
    */
  def removeRepeatedLines(spark: SparkSession, dir: String,
      lineTokens: Int = 3, minDocs: Int = 3,
      hashKeys: Boolean = false): DataFrame = {
    // posexplode_outer + count(col) semantics: a NULL/empty text yields a
    // single null line that counts as zero lines — every doc_id surfaces
    val lines = docs(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), posexplode_outer(transform(
        sequence(lit(0), // Column./ is float division; floor+cast for the
          floor((size(col("t")) - 1) / lineTokens).cast("int")), // int seq
        j => concat_ws(" ",
          slice(col("t"), j * lineTokens + 1, lit(lineTokens))))))
      .withColumnRenamed("pos", "line_idx")
      .withColumnRenamed("col", "line")
      // the join/agg key: the line itself, or its 64-bit hash (guarded so
      // a null line keeps a NULL key and can never meet a hot marker)
      .withColumn("k",
        if (hashKeys) when(col("line").isNotNull, xxhash64(col("line")))
        else col("line"))
    val hot = lines.where(col("line").isNotNull)
      .groupBy(col("k"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("k"), lit(true).as("hot"))
    val keep = col("line").isNotNull && col("hot").isNull
    lines.join(hot, Seq("k"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("line")).as("n_lines"),
        count(when(keep, lit(1))).as("kept_lines"),
        // collect_list skips the nulls the `when` leaves for dropped lines
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(keep, struct(col("line_idx"), col("line"))))),
          s => s("line"))).as("cleaned_text"))
  }

  /** Exact SUBSTRING deduplication — the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better") ExactSubstr family:
    * any `k`-token span occurring in ≥ `minDocs` DISTINCT documents is
    * removed from EVERY document (the paper's all-occurrences rule —
    * removing all copies of a duplicated span measurably helps and
    * needs no arbitrary survivor choice), and each document is
    * reassembled from its surviving tokens in order. Token `j` is
    * removed iff some repeated span starting at `s ≤ j < s+k` covers it,
    * so overlapping repeated spans union into one removed region —
    * exactly the paper's "remove the repeated range" semantics at
    * span-start granularity.
    *
    * Distributed shape (NEVER a suffix array on the driver, never
    * all-pairs): pass one slides a width-`k` window per document (narrow,
    * scan-speed) and aggregates span document-frequency with map-side
    * combine — a syndicated span is a hot KEY, not a hot partition; pass
    * two inner-joins the spans against the (small, ∝ true duplication)
    * hot-span set, folds each document's repeated starts into one sorted
    * array, and rewrites the document with a single co-partitioned join
    * on doc_id. With `hashKeys = true` (the production wire shape, gated
    * as `x_dedup_substr_hashed`) the df aggregate and marker join key on
    * `xxhash64(span)` — 8 bytes per shuffled key regardless of k — with
    * results identical modulo 64-bit collisions, which is why the
    * string-keyed DuckDB oracle verifies both. At 100 TB nothing holds
    * more than one document's tokens in memory at once, and the only
    * corpus-sized shuffle carries (key, doc_id, start) triples.
    */
  def removeRepeatedSubstrings(spark: SparkSession, dir: String,
      k: Int = 8, minDocs: Int = 2, hashKeys: Boolean = false): DataFrame = {
    val toks = substrToks(docs(spark, dir))
    // ONE gram pass, not two: the window-slide feeds BOTH the df
    // aggregate and the marker join, and their exchanges differ (the
    // aggregate partial-combines below its shuffle) so ReuseExchange
    // cannot merge them — without pinning, the corpus-sized slide runs
    // twice. Materialize it once (localCheckpoint, the minhashLshPairsOf
    // pattern), keeping only the three columns both consumers need:
    // with hashKeys the artifact is ~20 B per token, far cheaper than a
    // second full scan + slide at 100 TB.
    val spans = substrSpans(toks, k, hashKeys)
      .select(col("doc_id"), col("start"), col("key"))
      .localCheckpoint(true)
    val hot = spans.groupBy(col("key"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("key"))
    substrRewrite(toks, spans, hot, k)
  }

  /** (doc_id, t): the tokenized view the substring operators share. */
  private def substrToks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), tokens(col("text")).as("t"))

  /** Every k-token span of every document: (doc_id, start, span, key). */
  private def substrSpans(toks: DataFrame, k: Int,
      hashKeys: Boolean): DataFrame =
    toks.filter(size(col("t")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("t")) - k),
        i => concat_ws(" ", slice(col("t"), i + 1, lit(k))))))
      .withColumnRenamed("pos", "start")
      .withColumnRenamed("col", "span")
      .withColumn("key",
        if (hashKeys) xxhash64(col("span")) else col("span"))

  /** Rewrite each document dropping every token covered by a span whose
    * key is in `hot`; surfaces every doc in `toks` (null/short docs keep
    * everything).
    */
  private def substrRewrite(toks: DataFrame, spans: DataFrame,
      hot: DataFrame, k: Int): DataFrame = {
    val bad = spans.join(hot, Seq("key"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("start"))).as("bads"))
    // left join + coalesce-to-empty so a doc with no repeated span (or
    // null/short text) keeps everything; a null `exists` result would
    // silently DROP tokens (filter treats null predicates as false)
    toks.join(bad, Seq("doc_id"), "left")
      .withColumn("bads",
        coalesce(col("bads"), array().cast("array<int>")))
      .withColumn("kept", when(col("t").isNull, array().cast("array<string>"))
        .otherwise(filter(col("t"), (tok, j) =>
          !exists(col("bads"), s => j >= s && j < s + k))))
      .select(col("doc_id"),
        coalesce(size(col("t")), lit(0)).as("n_tokens"),
        size(col("kept")).as("kept_tokens"),
        concat_ws(" ", col("kept")).as("cleaned_text"))
  }

  /** ExactSubstr AUDIT report — what a curator reads before turning the
    * rewrite on: the `topN` most-duplicated k-token spans with their
    * document frequency, total occurrence count, and first containing
    * doc. The (df DESC, span ASC) ordering makes the top-N cut
    * deterministic. Same single df aggregate as the rewrite's pass one;
    * the report is ∝ topN.
    */
  def topRepeatedSubstrings(spark: SparkSession, dir: String,
      k: Int = 8, minDocs: Int = 2, topN: Int = 20): DataFrame =
    // two-level rollup instead of countDistinct: the (span, doc) level
    // partial-combines map-side and the span level then counts exact
    // rows — no distinct-expand, one fewer wide pass over the grams
    substrSpans(substrToks(docs(spark, dir)), k, hashKeys = false)
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("df"),
        sum(col("n_in_doc")).cast("long").as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= minDocs)
      .orderBy(col("df").desc, col("span").asc)
      .limit(topN)

  /** STREAMING ExactSubstr — the incremental form: arriving documents
    * are rewritten against a PERSISTED hot-span set (yesterday's
    * boilerplate artifact, built once from the resident corpus), the
    * production shape where the expensive df aggregate runs per corpus
    * snapshot and the stream pays only a narrow window-slide plus a
    * broadcastable join per micro-batch. Fixture: hot spans from the
    * even doc_ids (df ≥ `minDocs` within the index half), the odd half
    * arrives as a file stream; each micro-batch writes its rewritten
    * docs to a batchId-named subdirectory (the idempotent foreachBatch
    * recipe [[streamingNearDupsGate]] uses), and the gate returns their
    * union — hash-equal to the batch rewrite of the odd half against
    * the same span set.
    */
  def streamingSubstrGate(spark: SparkSession, dir: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    val d = docs(spark, dir)
    val hot = substrSpans(substrToks(d.filter(col("doc_id") % 2 === 0)),
        k, hashKeys = false)
      .groupBy(col("key"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("key"))
      .localCheckpoint(true)         // the persisted span-set artifact
    val src = graft.util.Scratch.dir("graft_substr_stream_src")
    d.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(src.toString)
    val out = graft.util.Scratch.dir("graft_substr_stream_out").toString
    val q = spark.readStream.schema(d.schema).parquet(src.toString)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val toks = substrToks(batch)
        substrRewrite(toks, substrSpans(toks, k, hashKeys = false), hot, k)
          .write.mode("overwrite").parquet(s"$out/b$batchId")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_tokens", IntegerType),
      StructField("kept_tokens", IntegerType),
      StructField("cleaned_text", StringType)))
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(out)
  }

  /** Composition gate: [[removeRepeatedSubstrings]] → per-source quality
    * accounting — the "how much cross-document boilerplate did
    * ExactSubstr reclaim, and from where" report a curation pipeline
    * runs after the rewrite. The kept ratio divides two EXACT integer
    * sums (one correctly-rounded double division, engine-stable), never
    * averages per-doc floats whose summation order could drift.
    */
  def substrQualityBySource(spark: SparkSession, dir: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    val cleaned = removeRepeatedSubstrings(spark, dir, k, minDocs)
    docs(spark, dir).select(col("doc_id"), col("source"))
      .join(cleaned, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        sum(col("n_tokens") - col("kept_tokens")).cast("long")
          .as("removed_tokens"),
        count(when(col("kept_tokens") < col("n_tokens"), lit(1)))
          .as("n_docs_affected"),
        round(sum(col("kept_tokens")).cast("double") /
          sum(col("n_tokens")).cast("double"), 4).as("kept_ratio"))
  }

  /** Exact dedup accounting by content hash, per source: documents vs unique
    * documents (md5 — portable to every oracle engine).
    */
  def exactBySource(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"))

  /** Word n-gram shingle sets per doc: distinct n-token shingles
    * (size-n+1 of them for size ≥ n; docs shorter than n are dropped).
    *
    * Built by the codegen'd [[graft.functions.ShingleArray]] expression —
    * the equivalent `array_distinct(transform(sequence, slice, concat_ws))`
    * chain runs interpreted (higher-order functions have no codegen) and
    * optimizer rules copy generator expressions into inferred filters, so
    * the HOF form was evaluated up to 3× per row outside whole-stage
    * codegen. ShingleArray is total (short docs → empty array), making
    * those inferred-filter copies safe as well as cheap.
    */
  def shingles(df: DataFrame, n: Int = 3): DataFrame = {
    val tk = tokens(col("text"))
    df.filter(size(tk) >= n)
      .select(col("doc_id"),
        graft.functions.ShingleArray.shingle_array(tk, n).as("shingles"))
  }

  /** Exact Jaccard over a candidate pair set (d1, d2, shared, n1, n2). */
  private def jaccard: Column =
    col("shared").cast("double") /
      (col("n1") + col("n2") - col("shared")).cast("double")

  /** Exhaustive n-gram Jaccard near-dup pairs: explode shingles, self-join on
    * shingle, count shared, filter jaccard ≥ threshold. Deterministic output
    * (d1 < d2, rounded score).
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3): DataFrame =
    ngramJaccardPairsOf(docs(spark, dir), threshold, n)

  /** [[ngramJaccardPairs]] over an explicit (doc_id, text) frame. */
  def ngramJaccardPairsOf(df: DataFrame, threshold: Double = 0.8,
      n: Int = 3): DataFrame = {
    val sh = shingles(df, n)
    // join on 64-bit shingle hashes, not strings: the shuffle carries 8-byte
    // keys and the join compares longs; a cross-engine-visible collision
    // would need ~2^32 distinct shingles per bucket (not at any plausible SF)
    // hash AFTER the explode: xxhash64 on the exploded column is codegen'd,
    // where transform() inside the generator runs interpreted (lambda
    // functions have no doGenCode) and splits the stage
    val ex = sh.select(col("doc_id"),
        explode(col("shingles")).as("span"), size(col("shingles")).as("n"))
      .select(col("doc_id"), xxhash64(col("span")).as("s"), col("n"))
    val a = ex.as("a"); val b = ex.as("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"),
        first(col("a.n")).as("n1"), first(col("b.n")).as("n2"))
      .withColumn("jaccard", round(jaccard, 3))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** Directed shingle-containment pairs: C(A→B) = |S(A)∩S(B)| / |S(A)| —
    * the asymmetric cousin of Jaccard that catches a SHORT document
    * embedded inside a LONGER one (quote inclusion, boilerplate wrapping,
    * excerpt pages), which symmetric Jaccard misses because the union is
    * dominated by the long side. Same exhaustive shared-shingle join
    * skeleton as [[ngramJaccardPairs]] (64-bit hashed shingle keys, the
    * shuffle is the only data movement), emitting BOTH directions of each
    * overlapping pair and thresholding on the direction's own containment.
    * Like the Jaccard form this is the oracle yardstick; at 100 TB the
    * candidate set comes from MinHash-LSH banding (containment-calibrated
    * banding needs the asymmetric variant — divide band agreement by the
    * SHORTER doc's signature — but candidates from plain banding are a
    * superset at any threshold ≥ the Jaccard one, so the production path
    * is band-join → exact containment verify, same as
    * [[minhashLshPairs]]).
    */
  /** Gate form: the contiguous `doc_id < 512` slice — the winnow-pairs
    * pattern. At the correctness SF (0.01, 500 docs) the slice is the
    * WHOLE corpus, so the oracle still checks all 50 planted pairs; it
    * exists so the bench SF's quadratic shared-shingle join stays
    * bounded (uncapped sf0.1 cost recorded in SCALE.md — the capped
    * cost is not the production number anyway, the LSH/PPJoin paths
    * are).
    */
  def containmentPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.9, n: Int = 3): DataFrame =
    containmentPairsOf(docs(spark, dir).filter(col("doc_id") < 512),
      threshold, n)

  /** [[containmentPairs]] over an explicit (doc_id, text) frame. */
  def containmentPairsOf(df: DataFrame, threshold: Double = 0.9,
      n: Int = 3): DataFrame = {
    val sh = shingles(df, n)
    val ex = sh.select(col("doc_id"),
        explode(col("shingles")).as("span"), size(col("shingles")).as("n"))
      .select(col("doc_id"), xxhash64(col("span")).as("s"), col("n"))
    val a = ex.as("a"); val b = ex.as("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d_sub"), col("b.doc_id").as("d_super"))
      .agg(count(lit(1)).as("shared"), first(col("a.n")).as("n_sub"))
      .withColumn("containment", round(col("shared") / col("n_sub"), 3))
      .filter(col("containment") >= threshold)
      .select("d_sub", "d_super", "containment")
  }

  /** PPJoin-style EXACT-threshold Jaccard pairs via prefix filtering
    * (Chaudhuri et al. ICDE 2006 SSJoin; Bayardo et al. WWW 2007
    * AllPairs; Xiao et al. WWW 2008 PPJoin): identical output to
    * [[ngramJaccardPairsOf]], but candidate generation only indexes each
    * document's PREFIX — its `n - ceil(t·n) + 1` globally-rarest
    * shingles — instead of every shingle. The prefix-filtering principle
    * guarantees any pair with J ≥ t shares a prefix element under a
    * total global order (here: document frequency ascending, hash as
    * tiebreak — rare-first, so prefixes land in the emptiest buckets), and
    * a length filter (`min(n1,n2) ≥ t·max(n1,n2)`, implied by J ≥ t)
    * prunes size-mismatched collisions before the pair ever forms.
    * Candidates are then exact-verified on the full shingle sets.
    *
    * This is the exact counterpart to MinHash-LSH: LSH's candidate count
    * is tunable but probabilistic; prefix filtering is lossless — at
    * 100 TB it is THE way to run an exact-threshold set-similarity join
    * without the full inverted index's O(sum of bucket²) blowup, because
    * hot (high-df) shingles are precisely the ones prefixes exclude.
    * Shapes: one df-count aggregate, one per-doc window (partitioned by
    * doc_id — no global sort), a prefix×prefix equi-join on 8-byte
    * hashes, and a verify join that moves only candidate docs' arrays.
    *
    * The verification threshold is applied to `round(j, 3)` exactly as
    * the exhaustive form does; prefixes are sized for `t − 5e-4` so a
    * pair whose true Jaccard sits just under t but rounds up to it is
    * still guaranteed a candidate (and fp noise in `ceil(t·n)` is
    * absorbed the same way).
    */
  def ppjoinPairsOf(df: DataFrame, threshold: Double = 0.8,
      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingles(df, n)
    val tSafe = threshold - 5e-4
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("span"),
        size(col("shingles")).as("nsz"))
      .select(col("doc_id"), xxhash64(col("span")).as("s"), col("nsz"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .filter(col("rk") <= col("nsz") - ceil(col("nsz") * tSafe) + 1)
      .select(col("doc_id"), col("s"), col("nsz"))
    val a = prefix.as("a"); val b = prefix.as("b")
    val cand = a.join(b,
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.nsz"), col("b.nsz")).cast("double") >=
            greatest(col("a.nsz"), col("b.nsz")).cast("double") * tSafe)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val s1 = sh.select(col("doc_id").as("d1"), col("shingles").as("sh1"))
    val s2 = sh.select(col("doc_id").as("d2"), col("shingles").as("sh2"))
    cand.join(s1, "d1").join(s2, "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).as("shared"),
        size(col("sh1")).as("n1"), size(col("sh2")).as("n2"))
      .withColumn("jaccard", round(jaccard, 3))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** Gated [[ppjoinPairsOf]] over the documents table — must equal the
    * exhaustive [[ngramJaccardPairs]] result (same oracle). */
  def ppjoinPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.8, n: Int = 3): DataFrame =
    ppjoinPairsOf(docs(spark, dir), threshold, n)

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the doc's shingle hashes — a permutation-min sketch whose
    * agreement rate estimates Jaccard. One codegen'd pass per row via the
    * custom [[graft.functions.MinHashSig]] expression: per-doc narrow
    * compute, zero shuffles (an explode+groupBy formulation would shuffle
    * every (doc, shingle) pair).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 32): DataFrame =
    sh.select(col("doc_id"),
      graft.functions.MinHashSig.minhash_sig(col("shingles"), numHashes)
        .as("sig"))

  /** Band keys for a signature table: (band index, hash of the band's
    * slice) — `bands` rows per doc, the LSH bucket-join key.
    */
  private def bandKeys(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(bnd =>
        xxhash64(concat_ws(",",
          slice(col("sig"), bnd * rows + 1, rows).cast("string")), lit(bnd))): _*))
        .as(Seq("band", "bucket")))

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows, bucket-join docs agreeing on any whole band,
    * then verify candidates with EXACT Jaccard (so output precision is 1.0;
    * banding only controls recall/candidate count). At 100 TB the band join
    * is the only shuffle and candidates stay ∝ true near-dups.
    *
    * The shingle table is `cache()`d (it feeds the band keys AND both
    * sides of the exact verify) and stays resident for the session —
    * callers invoking this repeatedly in one long-lived session should
    * compute [[shingles]] themselves and manage its lifecycle.
    */
  def minhashLshPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3): DataFrame =
    minhashLshPairsOf(docs(spark, dir), threshold, numHashes, bands, n)

  /** [[minhashLshPairs]] over an explicit (doc_id, text) frame — built as
    * [[prepareIndex]] + [[pairsWithinPrepared]], so the band-join and
    * exact-verify logic exists in exactly one place. The prepared tables
    * are pinned only for the duration of THIS call: the shingle table
    * feeds the band keys and both verify sides, so it is persisted, the
    * (tiny, ∝ true near-dups) pair table is materialized eagerly, and the
    * wide shingle cache is released before returning — repeated calls in
    * a long-lived session no longer accumulate resident shingle tables
    * (the materialized pair blocks are reclaimed by the ContextCleaner
    * when the returned frame goes unreachable, unlike CacheManager
    * entries which pin forever). Callers that want lazy plans over a
    * shared artifact should [[prepareIndex]]+persist themselves.
    */
  def minhashLshPairsOf(df: DataFrame,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3): DataFrame = {
    val prepared = prepareIndex(df, numHashes, bands, n).persist()
    val pairs = pairsWithinPrepared(prepared, threshold).localCheckpoint(true)
    prepared.release()
    pairs
  }

  /** Exact duplicated-span detection: n-token shingles occurring in ≥ 2
    * distinct documents — the "exact substring duplication" pass training
    * corpora run before fuzzy dedup (boilerplate, license blocks, templated
    * text). Top spans by document frequency.
    *
    * Plan shape for scale: the wide span strings never enter a shuffle.
    * Shingles are `array_distinct` per doc, so every (doc, span) pair is
    * unique and `count(*)` equals `count(DISTINCT doc_id)`; the count
    * groups on `xxhash64(span)` (16-byte shuffle rows, map-side combine)
    * and only the ≥ minDocs survivor hashes — sized by true duplication,
    * not corpus size — join back onto a second narrow shingle pass to
    * recover text. The join carries no broadcast hint on purpose: AQE sees
    * the survivor set's actual size after the aggregate stage and converts
    * to broadcast when it fits, while a boilerplate-heavy corpus whose
    * survivor set is huge degrades to a shuffle join instead of a driver
    * OOM. A 64-bit collision between two spans would merge their
    * counts; at ~10^9 distinct spans the collision odds are ~10^-1.7 per
    * corpus for SOME pair, but a merged pair still needs both members in
    * the top-k to change the output — acceptable for a report query, same
    * trade the ngram/minhash joins make.
    */
  def duplicatedSpans(spark: SparkSession, dir: String,
      n: Int = 13, minDocs: Int = 2, topK: Int = 20): DataFrame = {
    def sp = shingles(docs(spark, dir), n)
      .select(col("doc_id"), explode(col("shingles")).as("span"))
    val hot = sp.groupBy(xxhash64(col("span")).as("h"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    sp.select(col("span"), xxhash64(col("span")).as("h"))
      .join(hot, "h")
      .select(col("span"), col("n_docs")).distinct()
      .orderBy(col("n_docs").desc, col("span").asc)
      .limit(topK)
  }

  // ——— Incremental near-dup detection: pair a new delta batch against an
  // already-indexed corpus WITHOUT re-pairing the index against itself (the
  // nightly-ingest / streaming-ingest shape). Same MinHash/LSH machinery as
  // minhashLshPairs, but the band join is delta-vs-index only: signature
  // the delta (narrow codegen pass), band-join its small key set against
  // the prepared index — AQE broadcasts the delta side — and exact-verify
  // only the candidates. Cost ∝ delta, not corpus.

  /** An index corpus prepared for repeated delta lookups: its shingle and
    * band-key tables, computed once. `persist()` both (and `release()`
    * when done) for multi-use lifecycles — a streaming query does this
    * automatically for its own lifetime.
    */
  case class PreparedIndex(shingles: DataFrame, bandKeys: DataFrame) {
    def persist(): PreparedIndex = {
      shingles.persist(); bandKeys.persist(); this
    }
    def release(): Unit = { shingles.unpersist(); bandKeys.unpersist() }
  }

  /** Build the [[PreparedIndex]] for a static corpus (the write-once step
    * a production ingest runs when a doc enters the index; persisted
    * bucketed by (band, bucket) at 100 TB).
    */
  def prepareIndex(index: DataFrame, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3): PreparedIndex = {
    val sh = shingles(index, n)
    PreparedIndex(sh,
      bandKeys(minhashSignatures(sh, numHashes), bands, rows = numHashes / bands))
  }

  /** Delta-vs-prepared-index near-dup pairs: band-join the delta's keys
    * against the index's, exact-verify candidates. A doc_id present on
    * BOTH sides (an at-least-once re-delivery) is excluded — it would
    * otherwise pair with itself at jaccard 1.0 and poison a reject queue.
    */
  def pairsAgainstIndex(delta: DataFrame, prepared: PreparedIndex,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3): DataFrame =
    pairsAgainstPrepared(prepareIndex(delta, numHashes, bands, n), prepared,
      threshold)

  /** Delta-vs-index pairs where BOTH sides are already prepared — the
    * zero-recompute form for a caller that needs the delta's band keys
    * and shingles for more than one job ([[dedupClustersIncrementalOf]]
    * pairs the delta within itself AND against the index; preparing the
    * delta once serves both).
    */
  def pairsAgainstPrepared(delta: PreparedIndex, index: PreparedIndex,
      threshold: Double = 0.8): DataFrame = {
    val candidates = delta.bandKeys.as("a").join(index.bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("d_new"), col("b.doc_id").as("d_index"))
      .distinct()
    candidates
      .join(delta.shingles
        .select(col("doc_id").as("d_new"), col("shingles").as("sh1")),
        "d_new")
      .join(index.shingles
        .select(col("doc_id").as("d_index"), col("shingles").as("sh2")),
        "d_index")
      .select(col("d_new"), col("d_index"),
        round(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"), 3)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One-shot delta-vs-index pairing (builds the index prep inline; for
    * repeated or streaming use, [[prepareIndex]] once instead).
    */
  def minhashPairsAgainstIndex(delta: DataFrame, index: DataFrame,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3): DataFrame =
    pairsAgainstIndex(delta, prepareIndex(index, numHashes, bands, n),
      threshold, numHashes, bands, n)

  /** Streaming incremental dedup: flag each micro-batch of a document
    * stream against a static indexed corpus — the ingest-time near-dup
    * gate. The index's shingles and band keys are computed ONCE and kept
    * persisted for the stream's lifetime (per-batch cost is ∝ batch, not
    * corpus — recomputing the index side every trigger would invert
    * that); they are released when the query terminates. `foreachBatch`
    * gives each batch the full batch machinery (band join, AQE broadcast
    * of the small delta side, exact verify); `onPairs` routes the
    * verified pairs (reject queue, tombstone write, metric). Returns the
    * started query; callers own its lifecycle.
    */
  /** [[streamingNearDups]] gated end to end: the odd-id docs arrive as a
    * file STREAM and are flagged per micro-batch against the persisted
    * even-id index — the nightly-ingest topology actually running through
    * Structured Streaming's scheduler, prepared-index reuse across
    * batches included. Per-batch outputs append to parquet; the union
    * over batches must equal the batch delta-vs-index answer (same
    * DuckDB oracle as `x_dedup_incremental`) REGARDLESS of how the
    * scheduler splits files into batches, because each delta doc is
    * flagged against the static index exactly once.
    */
  def streamingNearDupsGate(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val d = docs(spark, dir)
    val src = graft.util.Scratch.dir("graft_ndstream_src")
    d.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(src.toString)
    val out = graft.util.Scratch.dir("graft_ndstream_out").toString
    val stream = spark.readStream.schema(d.schema).parquet(src.toString)
    // idempotent sink: each micro-batch OVERWRITES its own batchId-named
    // subdirectory, so a batch replayed after a failure rewrites the same
    // files instead of double-appending its pairs — the standard
    // foreachBatch exactly-once recipe for a non-transactional store
    val q = streamingNearDups(stream, d.filter(col("doc_id") % 2 === 0),
      threshold) { (pairs, batchId) =>
      pairs.write.mode("overwrite").parquet(s"$out/b$batchId")
    }
    q.processAllAvailable()
    q.stop()
    // explicit schema + recursive lookup: a run that produced zero pairs
    // has no files to infer from, and the pairs live in per-batch subdirs
    import org.apache.spark.sql.types._
    val pairSchema = StructType(Seq(
      StructField("d_new", LongType), StructField("d_index", LongType),
      StructField("jaccard", DoubleType)))
    spark.read.schema(pairSchema)
      .option("recursiveFileLookup", "true").parquet(out)
  }

  def streamingNearDups(deltaStream: DataFrame, index: DataFrame,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3)(onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val prepared = prepareIndex(index, numHashes, bands, n).persist()
    val q = deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onPairs(
          pairsAgainstIndex(batch, prepared, threshold, numHashes, bands, n),
          batchId)
      }
      .start()
    // release the pinned index tables when the stream ends, however it ends:
    // a StreamingQueryListener on termination is the supported hook (no
    // detached thread, no swallowed exceptions). The isActive re-check
    // closes the tiny window where the query terminates before the listener
    // registers (events posted before addListener are not replayed).
    val spark = index.sparkSession
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    def releaseOnce(): Unit =
      if (released.compareAndSet(false, true)) prepared.release()
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == q.id) {
          releaseOnce()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    if (!q.isActive) { releaseOnce(); spark.streams.removeListener(listener) }
    q
  }

  /** Gated incremental-dedup report: the "index" is the even doc_ids, the
    * "delta" the odd ones.
    */
  def incrementalNearDups(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val d = docs(spark, dir)
    minhashPairsAgainstIndex(
      d.filter(col("doc_id") % 2 === 1),
      d.filter(col("doc_id") % 2 === 0), threshold)
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * `minShared` distinct n-token spans with any document of an eval set —
    * the n-gram-overlap test used to scrub benchmark leakage from
    * pretraining corpora. `bench`/`train` are any DataFrames with
    * (doc_id, text).
    *
    * Scale shape: the eval side reduces to a distinct set of 8-byte span
    * hashes whose size is bounded by the benchmark suite (MBs), not the
    * corpus, so the join against the corpus-sized span stream is a
    * natural AQE broadcast; counts are per-doc partial aggregates. Spans
    * are already distinct per doc ([[shingles]]), so `count(*)` is the
    * distinct shared-span count.
    */
  def contaminatedDocs(train: DataFrame, bench: DataFrame,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    def spanHashes(df: DataFrame) = shingles(df, n)
      .select(col("doc_id"), explode(col("shingles")).as("span"))
      .select(col("doc_id"), xxhash64(col("span")).as("h"))
    val benchSpans = spanHashes(bench).select(col("h")).distinct()
    spanHashes(train).join(benchSpans, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .filter(col("n_shared_spans") >= minShared)
  }

  /** Gated contamination report: the eval set is the deterministic
    * `doc_id % 10 == 0` slice of the corpus, the training set the rest.
    */
  def contaminationReport(spark: SparkSession, dir: String,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    val d = docs(spark, dir)
    contaminatedDocs(
      d.filter(col("doc_id") % 10 =!= 0),
      d.filter(col("doc_id") % 10 === 0), n, minShared)
  }

  /** [[contaminatedDocs]] with a Bloom prefilter — the shape that binds
    * when the corpus is 100 TB and the benchmark suite is megabytes: the
    * bench span-hash set folds into ONE Bloom bitset (a single tiny
    * aggregate), the bits ride into a codegen'd
    * [[graft.functions.BloomFilter.bloom_might_contain]] predicate on the
    * train side's exploded span hashes, and only the ~fpp survivors enter
    * the shuffle for the exact equi-join — the full train span stream
    * never shuffles. Bloom filters have no false negatives and the exact
    * join removes the false positives, so the output is IDENTICAL to the
    * exact operator by construction; the gate states that equality
    * against the same oracle.
    */
  def contaminatedDocsBloom(train: DataFrame, bench: DataFrame,
      n: Int = 8, minShared: Int = 1, numBits: Int = 1 << 22,
      numHashes: Int = 5): DataFrame = {
    def spanHashes(df: DataFrame) = shingles(df, n)
      .select(col("doc_id"), explode(col("shingles")).as("span"))
      .select(col("doc_id"), xxhash64(col("span")).as("h"))
    val benchSpans = spanHashes(bench).select(col("h")).distinct()
    import graft.functions.BloomFilter._
    val bytes = benchSpans.agg(bloom_agg(col("h"), numBits, numHashes))
      .collect()(0).getAs[Array[Byte]](0)
    spanHashes(train).filter(bloom_might_contain(col("h"), bytes))
      .join(benchSpans, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .filter(col("n_shared_spans") >= minShared)
  }

  /** Gated bloom-prefiltered contamination report — same split and same
    * oracle as [[contaminationReport]]; green means the prefilter lost
    * nothing.
    */
  def contaminationReportBloom(spark: SparkSession, dir: String,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    val d = docs(spark, dir)
    contaminatedDocsBloom(
      d.filter(col("doc_id") % 10 =!= 0),
      d.filter(col("doc_id") % 10 === 0), n, minShared)
  }

  /** Update-rule strategies for [[connectedComponents]]. */
  sealed trait CcStrategy
  object CcStrategy {
    /** Min-label propagation — rounds ∝ component diameter. The right
      * default for dedup graphs (LSH-verified cliques-plus-chains with tiny
      * diameter).
      */
    case object MinLabel extends CcStrategy
    /** Alternating large-star/small-star (Kiveris et al., "Connected
      * Components in MapReduce and Beyond") — O(log n) practical rounds
      * regardless of diameter, skew-resistant; the planet-scale/deep-chain
      * answer.
      */
    case object LargeStarSmallStar extends CcStrategy
  }

  /** Connected components over an undirected pair list `(d1, d2)`.
    * Output: one `(doc_id, label)` row per vertex incident to an edge,
    * `label` = the component's minimum vertex id.
    *
    * [[CcStrategy.MinLabel]]: every vertex starts labelled with itself;
    * each round every vertex takes the min label among itself and its
    * neighbours; fixpoint = the component min. Each round is one shuffle
    * join of the (small, ∝ true-duplication) edge list against the label
    * table plus a map-side-combined min aggregate — no driver-side graph.
    * `localCheckpoint()` truncates lineage so plans don't grow with
    * iterations, and the convergence test collects a single count per round
    * (the standard driver-side loop for iterative graph algorithms —
    * GraphX/GraphFrames do the same). Rounds ∝ component diameter;
    * `maxIters` bounds the pathological chain.
    *
    * [[CcStrategy.LargeStarSmallStar]]: rewrites the EDGE set instead of a
    * label table — large-star hangs every larger neighbour onto the
    * neighbourhood min, small-star re-points smaller neighbours the same
    * way; the fixpoint is a star per component centred at its min. Rounds
    * are O(log n) in practice independent of diameter (the deep-chain
    * escape hatch the MinLabel scaladoc promises), and per-round cost is
    * the same join-plus-min-aggregate skeleton.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50,
      strategy: CcStrategy = CcStrategy.MinLabel): DataFrame =
    strategy match {
      case CcStrategy.MinLabel => ccMinLabel(pairs, maxIters)
      case CcStrategy.LargeStarSmallStar => ccLargeSmallStar(pairs, maxIters)
    }

  private def ccMinLabel(pairs: DataFrame, maxIters: Int): DataFrame = {
    val p = pairs.select(col("d1").as("src"), col("d2").as("dst"))
    val edges = p.union(p.select(col("dst"), col("src"))).cache()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      // carry each node's PREVIOUS label through the same aggregate that
      // computes the new one (every node appears exactly once in the
      // labels branch, so max over its non-null prev IS that label): the
      // convergence check becomes a filter over the just-checkpointed
      // round instead of a per-round join of two label tables — one
      // shuffle per round, not two
      val msgs = edges.join(labels, edges("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("label"),
          lit(null).cast("long").as("prev"))
        .union(labels.select(col("doc_id"), col("label"),
          col("label").as("prev")))
      val next = msgs.groupBy("doc_id")
        .agg(min("label").as("label"), max("prev").as("prev"))
        .localCheckpoint()
      // null-safe inequality: a node whose group somehow lacked a
      // labels-branch row would have prev = null, and a plain =!= would
      // DROP it from the changed count — converging silently on wrong
      // labels. With <=> the drift surfaces as non-convergence instead.
      changed = next.filter(!(col("label") <=> col("prev"))).count()
      labels = next.select(col("doc_id"), col("label"))
      it += 1
    }
    edges.unpersist()
    // a silent partial result would mark several docs canonical within one
    // real component — refuse instead; the caller raises maxIters (or
    // switches to the large-star/small-star rule for deep graphs)
    require(changed == 0,
      s"connected components did not converge in $maxIters rounds " +
        s"($changed labels still changing) — component diameter exceeds " +
        "maxIters; raise it or use a log-round update rule")
    labels
  }

  /** Alternating large-star/small-star over a CANONICAL edge set (lo < hi,
    * distinct, no self-loops). Per round, each operation is one
    * min-per-vertex aggregate joined back onto the edges — map-side
    * combined, skew-resistant (a hot vertex's edges spread over its scan
    * partitions; the aggregate moves one row per vertex per partition).
    * Convergence when the canonical edge set reaches a fixpoint: a star per
    * component centred at its minimum vertex, read off directly as labels.
    */
  private def ccLargeSmallStar(pairs: DataFrame, maxIters: Int): DataFrame = {
    def canonical(e: DataFrame): DataFrame =
      e.filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct()

    // large-star: for each vertex u with symmetric neighbourhood Γ(u),
    // m = min(Γ(u) ∪ {u}); hang every neighbour v > u onto m
    def largeStar(can: DataFrame): DataFrame = {
      val sym = can.union(can.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      canonical(sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }

    // small-star: orient each edge larger→smaller; for each u over its
    // smaller neighbours N(u), m = min(N(u)); re-point every v ∈ N(u) ∪ {u}
    // onto m
    def smallStar(can: DataFrame): DataFrame = {
      val oriented = can.select(col("v").as("u"), col("u").as("v"))
      val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      canonical(
        oriented.join(m, "u").select(col("v").as("u"), col("m").as("v"))
          .union(m.select(col("u"), col("m").as("v"))))
    }

    var edges = canonical(
      pairs.select(col("d1").as("u"), col("d2").as("v"))).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // both frames are DISTINCT canonical edge sets, so set equality is
      // |next| == |edges| == |next ∪ edges|: two cheap counts over
      // checkpointed blocks short-circuit unequal sizes, and one
      // union-distinct shuffle settles the equal-size case — the
      // two-exceptAll symmetric difference this replaces paid TWO
      // anti-join shuffles of the full edge set per round purely for
      // convergence detection
      val n0 = edges.count()
      val n1 = next.count()
      changed =
        if (n1 != n0) math.abs(n1 - n0)
        else next.union(edges).distinct().count() - n0
      edges = next
      it += 1
    }
    require(changed == 0,
      s"large-star/small-star did not converge in $maxIters rounds " +
        s"($changed edge deltas) — raise maxIters")
    // fixpoint = stars: every canonical edge is (center=min, member), so
    // members label directly and each center labels itself
    edges.select(col("v").as("doc_id"), col("u").as("label"))
      .union(edges.select(col("u").as("doc_id"), col("u").as("label")))
      .distinct()
  }

  /** Duplicate clusters with a canonical survivor — the production step
    * after pair generation: group near-dup pairs into components, keep the
    * minimum doc_id of each as canonical, drop the rest. Only clustered
    * docs appear (isolated docs are trivially canonical); `cluster_id` is
    * the component's min doc_id, so `is_canonical = (doc_id == cluster_id)`.
    */
  def dedupClusters(spark: SparkSession, dir: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3, strategy: CcStrategy = CcStrategy.MinLabel): DataFrame =
    clustersFromPairs(
      minhashLshPairs(spark, dir, threshold, numHashes, bands, n), strategy)

  /** The cluster report over an ALREADY-BUILT pair table — the step both
    * CC strategies share after pair generation. Factored out so a caller
    * holding a persisted pair artifact (the 100 TB case: pairs written
    * once per corpus snapshot, clustered under several policies) never
    * re-pays the shingle/signature/band-join pipeline per strategy.
    */
  def clustersFromPairs(pairs: DataFrame,
      strategy: CcStrategy = CcStrategy.MinLabel): DataFrame = {
    val labels = connectedComponents(pairs, strategy = strategy)
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("label").as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  /** Hard bound on memoized cluster tables: a driver session touches a
    * handful of (corpus, params) keys; past this the memo evicts the
    * least-recently-used entry rather than grow without bound (the
    * dropped frame's checkpoint blocks are reclaimed once unreferenced),
    * so a churning session re-pays at most ONE artifact's compute per
    * overflow, never all consumers at once. A long-lived service should
    * use the scratch-parquet + TTL form the [[dedupClustersShared]]
    * scaladoc prescribes instead of this in-memory memo.
    */
  private val ClusterMemoMaxEntries = 16

  private val clusterMemo =
    new graft.util.LruMemo[String, DataFrame](ClusterMemoMaxEntries)

  private val pairsMemo =
    new graft.util.LruMemo[String, DataFrame](ClusterMemoMaxEntries)

  /** [[minhashLshPairs]] behind the same per-process memo discipline as
    * [[dedupClustersShared]]: the pair table is the expensive half of
    * clustering (shingles → signatures → band join → exact verify; the
    * CC pass over it is cheap by comparison, ∝ true duplication) and it
    * feeds BOTH cluster strategies plus any survivor policy. The first
    * caller materializes it eagerly (`localCheckpoint` — the table is
    * tiny next to the corpus); later callers, including a different
    * [[CcStrategy]], reuse the checkpointed blocks. 100 TB analog: the
    * pair table written once per corpus snapshot to scratch storage,
    * clustered from there by every downstream policy.
    */
  def minhashLshPairsShared(spark: SparkSession, dir: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3): DataFrame = {
    val key = Seq(spark.sparkContext.applicationId, dir, threshold,
      numHashes, bands, n).mkString("|")
    pairsMemo.get(key) match {
      case Some(cached) => cached
      case None =>
        val computed =
          minhashLshPairs(spark, dir, threshold, numHashes, bands, n)
        // minhashLshPairsOf already localCheckpoints eagerly
        pairsMemo.putIfAbsent(key, computed)
    }
  }

  /** Drop every memoized cluster table (e.g. between tenants or after a
    * corpus rewrite). Safe concurrently: in-flight readers keep their
    * frames; only the memo's references are cleared.
    */
  def clearClusterMemo(): Unit = {
    clusterMemo.clear(); pairsMemo.clear(); incBaseMemo.clear()
  }

  /** [[dedupClusters]] behind a per-process memo: the cluster table is the
    * single most expensive artifact in the suite (banded candidate join +
    * iterative connected components) and it feeds FOUR downstream
    * consumers (the cluster report itself, keep-best survivor selection,
    * `Corpus.prepare`'s dup filter, `Corpus.leakageSafeSplit`'s
    * representatives). Computing it per consumer re-pays the iterative
    * job each time; here the first caller materializes it with an eager
    * `localCheckpoint` (the table is ∝ true duplication — tiny next to
    * the corpus) and later callers reuse the checkpointed blocks. The
    * production analog at 100 TB is writing the cluster table once per
    * corpus snapshot to scratch storage and reading it from every
    * consumer — same artifact, durable instead of in-memory. Keyed by
    * application id + all semantic parameters, so distinct sessions,
    * corpora, or thresholds never share. The memo's footprint is one tiny
    * checkpointed table per (corpus, params) the process touches — a
    * handful for a driver session; a long-lived multi-tenant service
    * would use the scratch-parquet form with TTL eviction instead.
    */
  def dedupClustersShared(spark: SparkSession, dir: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3, strategy: CcStrategy = CcStrategy.MinLabel): DataFrame = {
    val key = Seq(spark.sparkContext.applicationId, dir, threshold,
      numHashes, bands, n, strategy).mkString("|")
    // get + putIfAbsent rather than compute-under-lock: the cluster build
    // is a minutes-scale multi-stage Spark job and must never run while
    // holding the memo's monitor. The rare racing duplicate computation
    // is benign (both sides produce the same table; the loser's
    // checkpoint blocks are garbage-collected with its frame).
    clusterMemo.get(key) match {
      case Some(cached) => cached
      case None =>
        // built over the SHARED pair table, so a second strategy (or a
        // survivor policy) over the same corpus re-pays only its CC pass
        val computed = clustersFromPairs(
          minhashLshPairsShared(spark, dir, threshold, numHashes, bands, n),
          strategy).localCheckpoint(true)
        clusterMemo.putIfAbsent(key, computed)
    }
  }

  /** [[dedupClusters]] under an explicit strategy over the SHARED pair
    * table — the second-strategy consumer ([[CcStrategy.LargeStarSmallStar]]
    * in the registry) pays only its own connected-components rounds, not a
    * fresh shingle/signature/band-join pipeline. Result is hash-identical
    * to the from-scratch form: both strategies label every component by
    * its minimum vertex.
    */
  def dedupClustersSharedPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3, strategy: CcStrategy = CcStrategy.MinLabel): DataFrame =
    clustersFromPairs(
      minhashLshPairsShared(spark, dir, threshold, numHashes, bands, n),
      strategy)

  /** Near-dup pairs WITHIN a [[PreparedIndex]] (band-key self-join +
    * exact verify over the prepared shingles) — lets a caller that
    * already holds the prepared artifact derive intra-index pairs
    * without recomputing shingles/signatures.
    */
  def pairsWithinPrepared(prepared: PreparedIndex,
      threshold: Double = 0.8): DataFrame = {
    val a = prepared.bandKeys.as("a"); val b = prepared.bandKeys.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val s1 = prepared.shingles.select(col("doc_id").as("d1"),
      col("shingles").as("sh1"))
    val s2 = prepared.shingles.select(col("doc_id").as("d2"),
      col("shingles").as("sh2"))
    candidates.join(s1, "d1").join(s2, "d2")
      .select(col("d1"), col("d2"),
        round(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"), 3)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** Incremental cluster MAINTENANCE — the step after incremental pair
    * detection: fold a delta into an existing cluster table without
    * re-pairing the index against itself. Connectivity is fully carried
    * by the old table's star edges (cluster_id ↔ member — a spanning
    * star per component), so components over
    *
    *   star(old clusters) ∪ pairs(delta, delta) ∪ pairs(delta, index)
    *
    * equal components over the full corpus pair set: every index-index
    * pair the full recompute would find is already inside some old
    * component, the banding rule finds delta-delta and delta-index pairs
    * identically on both paths, and connected components depend only on
    * connectivity. Refinement: only components REACHED by a cross pair
    * can change (deltas bridge into the old graph solely through cross
    * pairs' index endpoints), so the second CC runs over affected star
    * edges + new pairs and every untouched component's labels pass
    * through verbatim. Cost ∝ |delta| banding + |touched clusters| +
    * the CC rounds over that subgraph — the corpus itself is touched
    * only through the (already persisted at 100 TB) prepared index,
    * never re-paired, and accumulated duplication the delta doesn't
    * touch is never re-clustered. The gate states the strong form:
    * hash-equality with the full recompute's oracle, under a 50 % delta
    * that touches most components (the worst case).
    */
  def dedupClustersIncrementalOf(index: DataFrame, delta: DataFrame,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3, strategy: CcStrategy = CcStrategy.MinLabel): DataFrame = {
    // ONE prepared artifact serves both index-side jobs: the intra-index
    // pair join and the delta-vs-index cross join — index shingles and
    // signatures are computed once (in production the prepared index is
    // the persisted artifact; here it's pinned for the call's lifetime)
    val prepared = prepareIndex(index, numHashes, bands, n).persist()
    val oldLabels = connectedComponents(
      pairsWithinPrepared(prepared, threshold), strategy = strategy)
      .localCheckpoint(true)
    val out = incrementalFromBase(prepared, oldLabels, delta,
      threshold, numHashes, bands, n, strategy)
    prepared.release()
    out
  }

  /** The DELTA side of incremental cluster maintenance over an
    * already-staged base (prepared index + its cluster labels) — the work
    * a nightly run actually pays once the index artifacts are persisted.
    * The caller owns `prepared`'s lifecycle (it is NOT released here;
    * [[dedupClustersIncrementalOf]] releases its own, the memoized
    * [[incrementalBaseShared]] keeps its pinned for the process).
    */
  def incrementalFromBase(prepared: PreparedIndex, oldLabels: DataFrame,
      delta: DataFrame, threshold: Double = 0.8, numHashes: Int = 32,
      bands: Int = 8, n: Int = 3,
      strategy: CcStrategy = CcStrategy.MinLabel): DataFrame = {
    // the delta is prepared ONCE: its shingles/signatures feed three jobs
    // (delta-delta band join, delta-vs-index band join, both exact
    // verifies) — preparing per job would recompute the signature pass
    // per consumer
    val preparedDelta = prepareIndex(delta, numHashes, bands, n).persist()
    val deltaPairs = pairsWithinPrepared(preparedDelta, threshold)
      .select(col("d1"), col("d2"))
    val crossPairs = pairsAgainstPrepared(preparedDelta, prepared, threshold)
      .select(col("d_new").as("d1"), col("d_index").as("d2"))
      .localCheckpoint(true)
    // only components the delta actually TOUCHES get re-clustered: the
    // delta can reach an old component solely through a cross pair's
    // index endpoint, so components without one are provably unmergeable
    // — their labels pass through untouched and the second CC runs over
    // affected star edges + new pairs only. At a nightly-delta scale
    // that's re-clustering ∝ touched duplication, not ∝ every cluster
    // the corpus has ever accumulated. (The gate's 50 % delta touches
    // most components — the worst case — and must still hash-equal the
    // full recompute.)
    val affected = oldLabels
      .join(crossPairs.select(col("d2").as("doc_id")).distinct(), "doc_id")
      .select(col("label")).distinct()
    val affectedMembers = oldLabels.join(affected, "label")
    val starEdges = affectedMembers
      .filter(col("doc_id") =!= col("label"))
      .select(col("label").as("d1"), col("doc_id").as("d2"))
    val untouched = oldLabels.join(affected, Seq("label"), "left_anti")
    // connectedComponents iterates eagerly and localCheckpoints its
    // labels, so by the time it returns nothing downstream references the
    // prepared frames — safe to release before building the report
    val relabelled = connectedComponents(
      starEdges.unionAll(deltaPairs).unionAll(crossPairs),
      strategy = strategy)
    preparedDelta.release()
    val labels = relabelled
      .unionAll(untouched.select(col("doc_id"), col("label")))
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("label").as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  /** An index corpus's STAGED incremental-maintenance base: the prepared
    * index plus its cluster labels — the two artifacts that, in
    * production, already exist when a delta arrives (the prepared index
    * is written at ingest, the cluster table at the last snapshot; both
    * persisted to scratch storage at 100 TB, re-read by every nightly
    * run). Pinned eagerly (`localCheckpoint`) and memoized per
    * (application, corpus, params) so the delta path pays only delta
    * work, mirroring the production cost split.
    */
  final case class IncrementalBase(prepared: PreparedIndex,
    oldLabels: DataFrame)

  private val incBaseMemo =
    new graft.util.LruMemo[String, IncrementalBase](ClusterMemoMaxEntries)

  /** Drop memoized incremental bases (between tenants / corpus rewrites). */
  def clearIncrementalBaseMemo(): Unit = incBaseMemo.clear()

  /** Build (or fetch) the memoized [[IncrementalBase]] for the gate's
    * even-doc_id index split. Checkpoint pinning (not `.persist()`) so the
    * artifact is lineage-free and eagerly materialized — the first caller
    * (or [[graft.SparkEntry.prestage]]) pays the build exactly once per
    * process.
    */
  def incrementalBaseShared(spark: SparkSession, dir: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      n: Int = 3,
      strategy: CcStrategy = CcStrategy.MinLabel): IncrementalBase = {
    val key = Seq(spark.sparkContext.applicationId, dir, threshold,
      numHashes, bands, n, strategy).mkString("|")
    incBaseMemo.get(key) match {
      case Some(cached) => cached
      case None =>
        val raw = prepareIndex(
          docs(spark, dir).filter(col("doc_id") % 2 === 0),
          numHashes, bands, n)
        val pinned = PreparedIndex(raw.shingles.localCheckpoint(true),
          raw.bandKeys.localCheckpoint(true))
        val oldLabels = connectedComponents(
          pairsWithinPrepared(pinned, threshold), strategy = strategy)
          .localCheckpoint(true)
        incBaseMemo.putIfAbsent(key, IncrementalBase(pinned, oldLabels))
    }
  }

  /** Gated incremental cluster maintenance: index = even doc_ids, delta =
    * odd (the [[incrementalNearDups]] split); the result must HASH-EQUAL
    * the full-corpus recompute's oracle. Runs over the memoized
    * [[incrementalBaseShared]] artifacts, so the gate measures the DELTA
    * path (the nightly cost) rather than re-staging yesterday's index and
    * cluster table on every call.
    */
  def dedupClustersIncremental(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val base = incrementalBaseShared(spark, dir, threshold)
    incrementalFromBase(base.prepared, base.oldLabels,
      docs(spark, dir).filter(col("doc_id") % 2 === 1), threshold)
  }

  /** Keep-BEST survivor selection: one row per near-dup cluster naming the
    * member that survives dedup — here "best" = LONGEST text (largest
    * `n_chars`, smallest doc_id on ties), the common curation rule that
    * keeps the superset copy when a page was scraped both with and
    * without its boilerplate/tail. Contrast with [[dedupClusters]]'s
    * `is_canonical` (min doc_id — arbitrary but stable): survivor CHOICE
    * is a policy, and this operator makes it a pluggable ranking rather
    * than an accident of id assignment. One extra narrow join (cluster
    * labels ⋈ doc lengths) and a max_by aggregate over O(cluster) rows —
    * nothing here scales worse than the clustering itself.
    */
  def keepBestSurvivors(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val clusters = dedupClustersShared(spark, dir, threshold)
    val lengths = docs(spark, dir).select(col("doc_id"), col("n_chars"))
    clusters.join(lengths, "doc_id")
      .groupBy(col("cluster_id"))
      // lexicographic max of (n_chars, -doc_id): longest text, then
      // smallest id — deterministic without relying on any engine's
      // arg_max tie-break
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id")))
          .as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), (-col("best.neg_id")).as("survivor_id"),
        col("best.n_chars").as("survivor_chars"), col("n_members"))
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum over
    * tokens of ±1 (bit i of each token's xxhash64). Near-dups have small
    * hamming distance. Pairs are found by joining on rotated 16-bit bands
    * (any pair at hamming ≤ 3 shares at least one of 4 exact bands).
    * One codegen'd pass via the custom [[graft.functions.SimHash64]]
    * expression.
    */
  def simhash(text: Column, portable: Boolean = false): Column =
    graft.functions.SimHash64.simhash64(tokens(text), portable)

  /** `portableHash = true` swaps the per-token xxhash64 for the low 64 bits
    * of MD5 (bit-identical to DuckDB `md5_number_lower`) so the whole
    * operator is oracle-checkable; the algorithm and plan shape are
    * unchanged. Band join recall is exact, not approximate: 4 disjoint
    * 16-bit bands and ≤3 differing bits means at least one band matches
    * (pigeonhole), so banding finds exactly the pairs the exhaustive
    * O(n²) join would.
    */
  def simhashPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 3, portableHash: Boolean = false): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), simhash(col("text"), portableHash).as("sh"))
    val banded = d.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(bnd =>
        shiftrightunsigned(col("sh"), bnd * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
