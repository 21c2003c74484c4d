package graft.ext.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.text.TextAnalysis.tokens
import graft.functions.PolyHash.poly_hash

/** Corpus-preparation operators for training-data pipelines: deterministic
  * sampling, token-budget sharding, and term weighting. All are narrow or
  * single-shuffle plans; none touch the driver.
  */
object Corpus {

  /** Portable content-addressed sampling draw shared by every mixture
    * operator: the low 8 bytes of md5(doc_id), read as an unsigned
    * big-endian integer modulo `grain` — bit-identical in DuckDB
    * (`CAST(concat('0x', substring(md5(..), 17, 16)) AS UBIGINT)`), so
    * the exact kept set is oracle-checkable.
    */
  private def md5Draw(grain: Long) =
    expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), " +
      s"17, 16), 16, 10) AS DECIMAL(20,0)) % $grain")

  /** α=0.5 temperature keep-thresholds per language:
    * floor(grain · sqrt(min_n / n_lang)) over a (lang, n_lang) counts
    * frame — sqrt and division are correctly-rounded IEEE ops, so the
    * integer thresholds agree bit-for-bit across engines.
    */
  private def sqrtThresholds(counts: DataFrame, grain: Long): DataFrame =
    counts.crossJoin(counts.agg(min(col("n_lang")).as("min_n")))
      .select(col("lang"),
        floor(lit(grain.toDouble) *
          sqrt(col("min_n").cast("double") / col("n_lang").cast("double")))
          .cast("long").as("thr"))

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Deterministic stratified (per-source) downsampling: keep a document iff
    * `polyhash(source|doc_id) mod 1000 < keepPerMille`. Hash-based sampling
    * beats `rand()` sampling at scale: reproducible across runs and stage
    * retries, stable under repartitioning, and per-key (no coordination —
    * each executor decides locally). The polynomial fingerprint hash is
    * engine-portable, so the exact sample is oracle-checkable.
    */
  def stratifiedSample(spark: SparkSession, dir: String,
      keepPerMille: Int = 200): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        pmod(poly_hash(concat_ws("|", col("source"),
          col("doc_id").cast("string"))), lit(1000L)).as("bucket"))
      .filter(col("bucket") < keepPerMille)

  /** Deterministic per-key sample: the `k` documents per source with the
    * SMALLEST portable hash of (source, doc_id) — bottom-k-by-hash is the
    * fixed-size cousin of [[stratifiedSample]]'s rate-based keep (same
    * reproducibility story: stable across runs, retries, and
    * repartitioning, no coordination), and it runs as the bounded
    * [[graft.functions.TopKBy]] heap aggregate — O(k) state per source,
    * map-side partials — NOT a per-key window sort, which is the
    * difference between shuffling k rows and shuffling every row per key
    * at 100 TB.
    */
  def perKeySample(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        pmod(poly_hash(concat_ws("|", col("source"),
          col("doc_id").cast("string"))), lit(1000000007L)).as("h"))
      .groupBy(col("source"))
      .agg(top_k_by(col("doc_id"), struct(col("h"), col("doc_id")), k)
        .as("picked"))
      .select(col("source"), posexplode(col("picked")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("col").as("doc_id"))
  }

  /** Per-source token-BUDGET trimming: keep each source's documents, best
    * first, until the source's token budget is exhausted — the mixture
    * allocation step of corpus assembly ("this source contributes at most
    * N tokens"). "Best first" here = longest text (n_chars DESC, doc_id
    * tie) — swap the ordering columns for a model-based quality score in
    * production; the MACHINERY (per-source ordered cumulative sum, one
    * keyed window) is the operator. A doc is kept iff the running token
    * total through itself still fits the budget, so the cut is a prefix
    * of the quality ordering. Integer token sums keep the gate
    * reduction-order-exact. Output: per-source kept-doc and kept-token
    * accounting.
    */
  def budgetTrim(spark: SparkSession, dir: String,
      budgetTokens: Long = 1000L): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .filter(col("cum") <= budgetTokens)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("tokens_kept"))
  }

  /** Token-budget shard packing: assign documents (per source, in doc_id
    * order) to shards of ~`budgetTokens` by cumulative token offset —
    * `shard_id = floor(exclusive_cumsum(tokens) / budget)`. This is the
    * distributed approximation of greedy sequence packing: exact greedy
    * (reset remainder per shard) is inherently sequential, while the offset
    * rule is one window cumsum per source — each shard overshoots by at most
    * one document. Output is per-shard accounting.
    */
  def packShards(spark: SparkSession, dir: String,
      budgetTokens: Long = 2000L): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"))
      .withColumn("offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard_id", floor(col("offset") / lit(budgetTokens.toDouble)))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
  }

  /** Per-document top term by TF-IDF. Scoring contract is the ratio form
    * `tf * N / df` (not `tf * ln(N/df)`): a pure IEEE product/quotient of
    * exact integers is bit-identical across engines, where a libm `ln` can
    * differ by an ulp and flip a ranking tie — the ratio form makes the
    * argmax oracle-stable and is documented as this operator's definition.
    * Ties broken by lexicographically smallest term. The doc count joins in
    * via a broadcast of a 1-row aggregate — no driver materialization.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df from the tf aggregate: tf already holds exactly one row per
    // (doc_id, term), so count(*) per term IS the document frequency —
    // re-aggregating the raw token stream with countDistinct would
    // re-shuffle the whole corpus and plan a distinct aggregate for the
    // same numbers (the derivation bm25TopK uses)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs(spark, dir).agg(count(lit(1)).as("n"))
    tf.join(df, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("n").cast("double") /
          col("df").cast("double")).as("score"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("term"), col("score")),
        struct(negate(col("score")), col("term"))).as("top"))
      .select(col("doc_id"), col("top.term").as("top_term"),
        round(col("top.score"), 4).as("tfidf"))
  }

  /** JSONL (newline-delimited JSON) interchange round-trip — the lingua
    * franca of LLM corpus exchange. Export writes one JSON object per
    * line (Spark's json sink IS jsonl); import reads with an explicit
    * schema (never schema inference at scale — one pass, not two). The
    * gated query proves the round-trip is value-preserving by comparing
    * the re-imported corpus against the source-of-truth parquet.
    */
  def jsonlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Scratch.dir("graft_jsonl").toString
    docs(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .write.mode("overwrite").json(out)
    spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING")
      .json(out)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("text")).as("text_md5"), length(col("text")).as("n_chars"))
  }

  /** Leakage-safe train/dev/test split: the split assignment hashes each
    * document's near-dup CLUSTER representative (its component's min
    * doc_id; isolated docs represent themselves), so near-duplicates can
    * never straddle a split boundary — the eval-contamination failure mode
    * of naive per-doc hashing, where a test document's near-copy sits in
    * train. Deterministic and coordination-free like [[stratifiedSample]]
    * (portable polynomial hash → oracle-checkable); buckets
    * `[0, trainPerMille)` → train, `[trainPerMille,
    * trainPerMille+devPerMille)` → dev, rest → test.
    *
    * Scale shape: the cluster table is ∝ true duplication (tiny next to
    * the corpus), so the left join broadcasts under AQE; everything else
    * is a narrow projection.
    */
  def leakageSafeSplit(spark: SparkSession, dir: String,
      trainPerMille: Int = 800, devPerMille: Int = 100): DataFrame = {
    val reps = graft.ext.dedup.TextDedup.dedupClustersShared(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    docs(spark, dir)
      .join(reps, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        pmod(poly_hash(col("rep").cast("string")), lit(1000L)))
      .select(col("doc_id"), col("source"), col("rep"),
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + devPerMille, "dev")
          .otherwise("test").as("split"))
  }

  /** End-to-end corpus-prep funnel — the composed pipeline a pretraining
    * run executes: quality filter (length + repetition) → near-dup removal
    * (keep each cluster's canonical doc) → deterministic stratified
    * downsample → chunk/token accounting, reported per source at every
    * stage.
    *
    * Plan shape: ONE scan of the corpus with all stage predicates as
    * boolean flags, one left join against the (∝ true-duplication)
    * non-canonical id set, one partial aggregate. Counting every funnel
    * stage in the same pass costs nothing extra at 100 TB, where three
    * separate count jobs would each re-scan.
    */
  def prepare(spark: SparkSession, dir: String, minTokens: Int = 20,
      maxDupRatio: Double = 0.7, keepPerMille: Int = 800): DataFrame = {
    val dupIds = graft.ext.dedup.TextDedup.dedupClustersShared(spark, dir)
      .filter(!col("is_canonical"))
      .select(col("doc_id"), lit(true).as("is_dup"))
    val t = tokens(col("text"))
    val flagged = docs(spark, dir)
      .withColumn("n_tokens", size(t))
      .withColumn("dup_ratio", lit(1.0) -
        size(array_distinct(t)).cast("double") / size(t).cast("double"))
      .join(dupIds, Seq("doc_id"), "left")
      .withColumn("pass_q",
        col("n_tokens") >= minTokens && col("dup_ratio") <= maxDupRatio)
      .withColumn("pass_d", col("pass_q") && col("is_dup").isNull)
      .withColumn("pass_s", col("pass_d") &&
        pmod(poly_hash(concat_ws("|", col("source"),
          col("doc_id").cast("string"))), lit(1000L)) < keepPerMille)
    flagged.groupBy(col("source")).agg(
      count(lit(1)).as("n_in"),
      count(when(col("pass_q"), 1)).as("n_quality"),
      count(when(col("pass_d"), 1)).as("n_dedup"),
      count(when(col("pass_s"), 1)).as("n_kept"),
      coalesce(sum(when(col("pass_s"), {
        // same last-chunk-id rule as TextAnalysis.chunkTokens: the count
        // is max(0, ceil((n - size)/stride)) + 1, not floor((n-1)/stride)
        // + 1 (which double-counts a redundant tail chunk)
        val size = graft.ext.text.TextAnalysis.ChunkSize
        val stride = size - graft.ext.text.TextAnalysis.ChunkOverlap
        greatest(lit(0),
          floor((col("n_tokens") - size + stride - 1) / lit(stride))) + 1
      })), lit(0L))
        .cast("long").as("n_chunks"),
      coalesce(sum(when(col("pass_s"), col("n_tokens"))), lit(0L))
        .cast("long").as("n_tokens_kept"))
  }

  /** The WHOLE training-data pipeline composed as one job — the user
    * story every stage-level gate builds toward: held-out benchmark →
    * quality filter (length + repetition, [[prepare]]'s rules, stacked
    * with the hashed-feature model classifier of
    * [[graft.ext.text.TextAnalysis.classifyQuality]], inline — no join) →
    * near-dup removal (corpus-wide shared cluster artifact, canonical
    * survivors only) → benchmark decontamination (bloom-prefiltered
    * 8-gram span overlap) → leakage-safe split (cluster-representative
    * hashing) → α=0.5 temperature mixture over the TRAIN split's
    * language counts — reported as per-(split, source) document and
    * token accounting. Every stage is the already-gated operator, so
    * this gate proves the column contracts COMPOSE and the DuckDB
    * oracle replays the entire funnel end to end.
    *
    * Plan shape: the quality/dedup/split/mixture chain is ONE corpus scan
    * with narrow flags plus left joins against artifacts that are each ∝
    * true duplication/contamination (cluster table, contaminated-id set,
    * L thresholds — all AQE-broadcastable) and one final partial
    * aggregate. The decontamination stage necessarily derives spans from
    * the surviving docs — a second scan of the survivor set (spans are
    * not a stored column); the cluster table itself comes from the
    * shared artifact, already computed once per corpus snapshot. The
    * corpus is never joined against itself.
    *
    * Execution note: the two stage pins below use `localCheckpoint(true)`,
    * so BUILDING this DataFrame is eager (Spark jobs run at construction
    * even if the result is never consumed) and the pinned blocks are
    * executor-local — lost on executor failure with no lineage to
    * recompute from. Correct for a single-process analytics session (the
    * gate/bench contract); a long-lived cluster deployment should swap
    * the pins for reliable `checkpoint()` or a persisted intermediate
    * table. Same caveat applies to
    * [[graft.ext.graph.GraphOps.triangleGate]].
    */
  def pipelineReport(spark: SparkSession, dir: String,
      minTokens: Int = 20, maxDupRatio: Double = 0.7,
      trainPerMille: Int = 800, devPerMille: Int = 100,
      grain: Long = 1000000L): DataFrame = {
    val all = docs(spark, dir)
    val bench = all.filter(col("doc_id") % 10 === 0)
    val corpus = all.filter(col("doc_id") % 10 =!= 0)
    val t = tokens(col("text"))
    val q = corpus
      .withColumn("n_tokens", size(t))
      .withColumn("dup_ratio", lit(1.0) -
        size(array_distinct(t)).cast("double") / size(t).cast("double"))
      .filter(col("n_tokens") >= minTokens && col("dup_ratio") <= maxDupRatio)
      // the model-based filter stacks on the heuristics — same inline
      // integer score and keep rule as x_text_classify, no join, still
      // one narrow pass
      .filter(graft.ext.text.TextAnalysis.classifierKeep(
        coalesce(graft.ext.text.TextAnalysis.classifierScore(col("text")),
          lit(0L)),
        col("n_tokens")))
    val clusters = graft.ext.dedup.TextDedup.dedupClustersShared(spark, dir)
    val nonCanon = clusters.filter(!col("is_canonical"))
      .select(col("doc_id"), lit(true).as("is_dup"))
    // pin the quality+dedup survivor set: it is referenced twice (the
    // contamination pass derives spans from it, the clean set subtracts
    // from it), and unpinned each reference re-inlines the corpus scan +
    // tokenize + classifier subtree — the stage the "ONE corpus scan"
    // contract says must run once. Project to the columns the funnel
    // still needs before pinning so the artifact is narrow (guide §2.3).
    val deduped = q.join(nonCanon, Seq("doc_id"), "left")
      .filter(col("is_dup").isNull)
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        col("n_tokens"))
      .localCheckpoint(true)
    val contaminated = graft.ext.dedup.TextDedup
      .contaminatedDocsBloom(deduped, bench)
      .select(col("doc_id"), lit(true).as("is_contam"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left")
      .filter(col("is_contam").isNull)
    val reps = clusters.select(col("doc_id"), col("cluster_id"))
    // pin the post-split frame too: train feeds two consumers (language
    // counts, the sampled join) and the non-train branch a third — each
    // would otherwise re-run the contamination join chain above. Narrow:
    // the report needs only (split, source, lang, n_tokens).
    val split = clean.join(reps, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        pmod(poly_hash(col("rep").cast("string")), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + devPerMille, "dev")
          .otherwise("test"))
      .select(col("doc_id"), col("split"), col("source"), col("lang"),
        col("n_tokens"))
      .localCheckpoint(true)
    val train = split.filter(col("split") === "train")
    val counts = train.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val sampledTrain = train.join(broadcast(sqrtThresholds(counts, grain)),
        "lang")
      .filter(md5Draw(grain) < col("thr"))
    sampledTrain.select(col("split"), col("source"), col("n_tokens"))
      .unionAll(split.filter(col("split") =!= "train")
        .select(col("split"), col("source"), col("n_tokens")))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
  }

  /** Training-sequence packing with overshoot accounting — the
    * context-window fill step after [[graft.ext.text.TextAnalysis
    * .chunkTokens]]: chunks pack contiguously per source (doc_id,
    * chunk_id order) into fixed `seqLen`-token sequences by the same
    * exclusive-cumsum offset rule as [[packShards]] (`seq_id =
    * floor(offset / seqLen)` — one window cumsum, no sequential greedy
    * loop), at chunk granularity. The report carries each sequence's
    * chunk count, token fill, and `overflow_tokens` — how far its last
    * chunk spills past the seqLen boundary (≤ one chunk by
    * construction) — the padding/truncation-waste accounting a training
    * run reads before deciding chunk size vs context length. Exact
    * greedy (reset per sequence) is inherently sequential; the offset
    * rule is the distributed form, and the overflow column quantifies
    * exactly what that approximation costs.
    */
  def packSequences(spark: SparkSession, dir: String,
      seqLen: Long = 64L): DataFrame = {
    val chunks = graft.ext.text.TextAnalysis.chunkTokens(docs(spark, dir))
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
    val src = docs(spark, dir).select(col("doc_id"), col("source"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks.join(src, "doc_id")
      .withColumn("offset",
        coalesce(sum(col("n_chunk_tokens")).over(w), lit(0L)))
      .withColumn("seq_id",
        floor(col("offset") / lit(seqLen.toDouble)).cast("long"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).cast("long").as("seq_tokens"),
        min(col("offset")).as("first_offset"))
      .select(col("source"), col("seq_id"), col("n_chunks"),
        col("seq_tokens"),
        greatest(lit(0L), col("first_offset") + col("seq_tokens") -
          (col("seq_id") + 1) * seqLen).cast("long").as("overflow_tokens"))
  }

  /** Contiguous global row IDs (0..n−1 in `orderCol` order) WITHOUT the
    * single-partition window a naive `row_number() OVER (ORDER BY …)`
    * plans — at 100 TB that window funnels the whole table through one
    * task, the canonical driver-shaped scale-killer this engine's specs
    * grep plans for. The distributed form is the textbook two-pass:
    * range-repartition on the order column (partitions are globally
    * ordered), sort within partitions, then one `zipWithIndex` pass
    * (a count-per-partition job to compute offsets + a map attaching
    * offset + local index). The RDD hop is deliberate and minimal: the
    * per-partition offset attach is the one genuinely imperative step,
    * and it is also exactly what every production "assign training
    * example ids" job does. Correctness is independent of where the
    * range sampler places partition boundaries — only the global order
    * matters, and that is pinned by (range partitioning, within-partition
    * sort, unique `orderCol`).
    */
  def contiguousIds(df: DataFrame, orderCol: String,
      numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val ranged = df.repartitionByRange(numParts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = StructType(
      ranged.schema.fields :+ StructField("contig_id", LongType, false))
    val withIds = ranged.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(withIds, schema)
  }

  /** Gated contiguous-ID assignment over the documents table. */
  def contiguousDocIds(spark: SparkSession, dir: String): DataFrame =
    contiguousIds(docs(spark, dir).select(col("doc_id")), "doc_id")

  /** [[packSequences]] re-based on REAL tokenizer counts: documents pack
    * into fixed `seqLen`-token training sequences by their BPE token
    * count ([[graft.ext.text.TextAnalysis.bpeTokens500]] — augmented
    * stream under the 500-merge sf0.1-trained vocab) instead of the
    * whitespace stand-in — the number a training
    * run actually bills against its context window. Same scale shape as
    * the whitespace form: one narrow codegen'd tokenize pass, one
    * running-sum window per source, one aggregate; null/blank docs pack
    * as zero-token members rather than vanishing.
    */
  def packSequencesBpe(spark: SparkSession, dir: String,
      seqLen: Long = 64L): DataFrame = {
    import graft.ext.text.TextAnalysis.bpeTokens500
    val counted = docs(spark, dir).select(col("doc_id"), col("source"),
      when(col("text").isNull, lit(0))
        .otherwise(size(bpeTokens500(col("text")))).cast("long").as("n_bpe"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .withColumn("offset", coalesce(sum(col("n_bpe")).over(w), lit(0L)))
      .withColumn("seq_id",
        floor(col("offset") / lit(seqLen.toDouble)).cast("long"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).cast("long").as("seq_tokens"),
        min(col("offset")).as("first_offset"))
      .select(col("source"), col("seq_id"), col("n_docs"),
        col("seq_tokens"),
        greatest(lit(0L), col("first_offset") + col("seq_tokens") -
          (col("seq_id") + 1) * seqLen).cast("long").as("overflow_tokens"))
  }

  /** Temperature-weighted mixture sampling — the pretraining language-mix
    * knob between "natural" (keep everything) and "uniform"
    * ([[rebalance]]): language l keeps rate (n_min/n_l)^(1−α). This
    * operator fixes α = 0.5, so the rate is `sqrt(n_min/n_l)` — chosen
    * deliberately because IEEE division and square root are both
    * correctly-rounded operations, making the integer keep-thresholds
    * bit-identical across engines (a libm `pow` for general α can differ
    * by an ulp at a threshold boundary and flip a document's fate; the
    * general-α form is the same code with `pow` and is NOT oracle-gated
    * for that reason). Selection is the same content-addressed md5 draw
    * as [[rebalance]]: retry/partition/engine-stable, corpus never
    * shuffles, thresholds broadcast.
    */
  def temperatureMixture(spark: SparkSession, dir: String,
      grain: Long = 1000000L): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    docs.join(broadcast(sqrtThresholds(counts, grain)), "lang")
      .filter(md5Draw(grain) < col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))
  }

  /** Rebalance the corpus to a uniform per-language mix (the pretraining
    * "don't let English drown everything" knob) by DETERMINISTIC hash
    * sampling: every language downsampled toward the smallest language's
    * count — document kept iff a portable 64-bit MD5 draw (low 8 bytes of
    * md5(doc_id), big-endian, modulo `grain`) falls below the language's
    * integer threshold floor(min_n · grain / n_lang). Content-addressed
    * selection is retry/partition/ENGINE stable (the DuckDB oracle
    * reproduces the exact kept set — both sides integer arithmetic, no FP
    * thresholds), unlike `df.sample`. At 100 TB: one tiny aggregate for
    * the per-language counts, a broadcast of L thresholds, and a narrow
    * filter — the corpus itself never shuffles. Kept counts concentrate
    * at min_n ± O(sqrt) per language (threshold granularity 1/grain).
    * Returns the per-language report (kept count + id checksum) so the
    * gate pins the exact selection, not just its size.
    */
  def rebalance(spark: SparkSession, dir: String,
      grain: Long = 1000000L): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val thresholds = counts
      .crossJoin(counts.agg(min(col("n_lang")).as("min_n")))
      .select(col("lang"),
        expr(s"CAST(min_n * $grain DIV n_lang AS BIGINT)").as("thr"))
    docs.join(broadcast(thresholds), "lang")
      .filter(md5Draw(grain) < col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))
  }

  /** Corpus-level overlap estimation — the train/eval contamination
    * DIAL, where [[graft.ext.dedup.TextDedup.decontaminate]] is the
    * per-document trigger: how similar are two corpora as shingle SETS?
    * Side A = even doc_id, side B = odd. Two answers in one row: a
    * per-slot MinHash sketch estimate (slot j keeps min over
    * `poly_hash(j + '|' + shingle)`; the fraction of slots where both
    * sides agree estimates Jaccard — Broder's classic estimator), and
    * the exact Jaccard over distinct 8-byte shingle hashes as the
    * yardstick. Integer permille end to end. At 100 TB only the sketch
    * survives: it reduces each corpus to `m` longs with map-side min
    * partials (shuffle ∝ m × partitions, nothing content-sized), and
    * sketches of immutable shards fold associatively — compute once per
    * shard, min-merge forever; the exact columns are the oracle
    * yardstick, priced like the dedup yardsticks (one distinct + one
    * join on 8-byte hashes).
    */
  def corpusOverlap(spark: SparkSession, dir: String,
      m: Int = 64): DataFrame = {
    // the shingle derivation (scan + tokenize + shingle explode) feeds
    // BOTH the sketch and the exact yardstick; checkpoint it once — the
    // same multi-consumer shape minhashLshPairsOf persists its shingle
    // table for
    val sh = graft.ext.dedup.TextDedup.shingles(docs(spark, dir))
      .select((col("doc_id") % 2).cast("int").as("side"),
        explode(col("shingles")).as("s"))
      .localCheckpoint()
    // all m slot-minima in ONE aggregate over the shingle stream (m
    // min columns, map-side partial combine → 2 result rows) — the
    // explode(sequence(0, m-1)) → groupBy(side, slot) formulation is
    // the 64× row-amplification anti-pattern MinHashSig documents;
    // the salted poly_hash family here must stay as-is because the
    // oracle replays it string for string
    val mins = (0 until m).map(j =>
      min(poly_hash(concat_ws("|", lit(j), col("s")))).as(s"mn_$j"))
    val sketch = sh.groupBy(col("side")).agg(mins.head, mins.tail: _*)
    val matchCount = (0 until m).map(j =>
      when(col(s"a.mn_$j") === col(s"b.mn_$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val agree = sketch.filter(col("side") === 0).as("a")
      .crossJoin(sketch.filter(col("side") === 1).as("b"))
      .select(matchCount.as("slot_matches"))
    val hx = sh.select(col("side"), poly_hash(col("s")).as("h")).distinct()
    val sizes = hx.agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_b"))
    val inter = hx.filter(col("side") === 0).select(col("h"))
      .join(hx.filter(col("side") === 1).select(col("h")), "h")
      .agg(count(lit(1)).as("n_shared"))
    agree.crossJoin(sizes).crossJoin(inter)
      .select(lit(m).as("m"), col("slot_matches"),
        expr(s"CAST(1000 * slot_matches DIV $m AS BIGINT)")
          .as("est_permille"),
        col("n_a"), col("n_b"), col("n_shared"),
        // greatest(.., 1): a degenerate corpus (no doc with 3+ tokens)
        // has zero shingles on both sides, and the jaccard denominator
        // must not divide by zero — the ratio is 0 either way
        expr("CAST(1000 * n_shared DIV greatest(n_a + n_b - n_shared, 1)" +
          " AS BIGINT)").as("exact_permille"))
  }

  /** Exact curriculum sharding WITHOUT a global sort: documents are
    * globally ordered by (score, doc_id) — score = n_chars here, the
    * classic short-to-long length curriculum — and cut into `k`
    * contiguous shards via `shard = rank·k div n` (0-based rank). A naive
    * `ntile`/`row_number` over an unpartitioned window funnels the whole
    * corpus through ONE partition; instead the global rank is assembled
    * from two scale-safe pieces: (1) a score histogram (shuffle ∝
    * distinct scores) whose running sum — windowed over the TINY
    * histogram only — gives each score's global offset, broadcast back;
    * (2) a per-score `row_number` (window partitioned BY SCORE: the
    * corpus moves once as narrow (score, id) records, and only a
    * degenerate near-single-score distribution would skew a partition).
    * `offset + within-score rank` IS the exact global (score, doc_id)
    * rank. The report aggregates per shard; `sum_ids` pins the exact
    * membership of every shard, not just its size.
    */
  def curriculumShards(spark: SparkSession, dir: String,
      k: Int = 16): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"),
      coalesce(col("n_chars").cast("long"), lit(-1L)).as("score"))
    val hist = d.groupBy(col("score")).agg(count(lit(1)).as("n_score"))
    val offsets = hist
      .withColumn("offset",
        coalesce(sum(col("n_score")).over(
          Window.orderBy(col("score"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(hist.agg(sum(col("n_score")).as("n_total")))
      .select(col("score"), col("offset"), col("n_total"))
    d.join(broadcast(offsets), "score")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("score")).orderBy(col("doc_id"))))
      .withColumn("shard",
        expr(s"CAST((offset + rn - 1) * $k DIV n_total AS INT)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"),
        sum(col("doc_id")).as("sum_ids"))
  }

  /** Deterministic training-order shuffle — the reproducible global
    * permutation a pretraining run needs: data order affects the model,
    * so the order must be derivable from (content, nothing else), stable
    * under retries, repartitioning, and engine choice — which `rand()`
    * and `df.orderBy(rand())` are not. Two INDEPENDENT content-addressed
    * draws from one md5 per document: the HIGH 8 bytes assign the shard
    * (`% nShards`), the LOW 8 bytes (mod `grain`, ties broken by doc_id)
    * order documents WITHIN the shard — so shard membership and
    * within-shard position are uncorrelated bits of the same hash, and
    * the full permutation is fixed by doc_ids alone.
    *
    * Scale shape: this is [[curriculumShards]]'s opposite number (random
    * order, not score order) and deliberately avoids any global sort —
    * production materializes shards with
    * `repartition(nShards, shard).sortWithinPartitions(draw, doc_id)` +
    * a partitioned write: one external-sort task per shard, nShards the
    * parallelism dial. The report's per-shard `row_number` window runs
    * the IDENTICAL one-task-per-shard ordered pass, so the gate measures
    * the real write shape. `order_sum` = Σ pos·doc_id pins the exact
    * permutation (any swap of two positions changes it).
    *
    * Sign-safety and type discipline (round 9, after two rounds of
    * driver-only hash reds): both draws come from 12-hex-char (48-bit)
    * md5 substrings — chars 1–12 assign the shard, chars 13–24 the
    * within-shard order — so neither engine ever parses 16 hex chars
    * into the 2^63 sign boundary (the r8 form paired Spark's
    * `conv(…,16,10) → DECIMAL(20,0)` against DuckDB's UBIGINT cast,
    * two different unsigned-edge semantics). Every emitted aggregate is
    * BIGINT: `sum(pos·doc_id)` fits Long while shard_rows·max_doc_id
    * stays under ~9.2e18 (e.g. 1e8-doc shards of 1e10 ids) — the gate
    * corpus sits orders of magnitude under that, and a deployment past
    * it widens this one aggregate to DECIMAL(38,0) on BOTH sides rather
    * than relying on DuckDB's silent HUGEINT promotion, which the
    * driver's typed hash check rejects against a DECIMAL/BIGINT column.
    */
  /** The two content-addressed draws — shard (md5 chars 1–12) and
    * within-shard order (chars 13–24) — in ONE place, shared by
    * [[trainingShuffle]] and [[trainingShuffleDraws]] so the diagnostic
    * micro-gate can never silently desynchronize from the aggregate gate
    * it exists to diagnose (the same single-sourcing discipline as the
    * BM25 factor SQL).
    */
  private def shuffleDrawCols(nShards: Int,
      grain: Long): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = (
    expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), " +
      s"16, 10) AS BIGINT) % $nShards").cast("int"),
    expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 13, 12), " +
      s"16, 10) AS BIGINT) % $grain"))

  def trainingShuffle(spark: SparkSession, dir: String, nShards: Int = 8,
      grain: Long = 1L << 40): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val (shardCol, drawCol) = shuffleDrawCols(nShards, grain)
    val d = docs(spark, dir).select(col("doc_id"))
      .withColumn("shard", shardCol)
      .withColumn("draw", drawCol)
    d.withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("draw"), col("doc_id"))))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(expr("CAST(pos AS BIGINT) * doc_id")).as("order_sum"))
  }

  /** Draw dump behind the `x_corpus_shuffle_draws` micro-gate:
    * `(doc_id, shard, draw)` from [[trainingShuffle]]'s two
    * content-addressed md5 draws for `doc_id < idCap` — the remote-
    * diagnosis companion to the aggregate gate (same motivation as
    * [[graft.ext.text.TextAnalysis.bm25Parts]]): if a driver
    * environment ever disagrees on the permutation again, the red rows
    * name the exact doc_id and which of the two draws diverged. The
    * id filter pushes to the scan, so the gate costs one pruned read.
    */
  def trainingShuffleDraws(spark: SparkSession, dir: String,
      nShards: Int = 8, grain: Long = 1L << 40,
      idCap: Long = 100L): DataFrame = {
    val (shardCol, drawCol) = shuffleDrawCols(nShards, grain)
    docs(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") < idCap)
      .withColumn("shard", shardCol)
      .withColumn("draw", drawCol)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rate every document by
    * how much its hashed n-gram feature distribution looks like a target
    * domain relative to the raw corpus, then keep the above-average
    * slice. Features are hashed bigrams (`poly_hash mod nBuckets` — the
    * paper's hashed n-gram space); the target here is the `targetLang`
    * slice standing in for the paper's curated target corpus.
    *
    * The paper's importance weight is a log-likelihood ratio; libm `log`
    * is not correctly rounded, so the portable stand-in is the
    * Laplace-smoothed integer ratio per bucket
    * `wt(b) = (t(b)+1)·SCALE div (s(b)+1)` summed over a document's
    * feature occurrences — monotone in the same direction, integer
    * end-to-end, so the oracle replays it exactly. The keep rule is
    * length-normalized (a raw weight SUM just selects long documents):
    * a doc stays when its mean per-feature weight clears the corpus
    * mean, computed as the integer `mu = tot_w div tot_feat` and
    * compared multiplied-out (`weight > mu·n_feat`) — no per-doc
    * division, and the per-doc products stay bounded by doc length.
    * The CORPUS-wide sums feeding mu are the one quantity that scales
    * with total feature count (~SCALE x corpus bigrams — past Long
    * around 9e12 features / ~10 TB of text), so they aggregate in
    * DECIMAL(38,0): exact at any realistic scale, matching DuckDB's
    * automatic BIGINT→HUGEINT sum widening, while mu itself (a mean
    * per-feature weight) always fits a Long.
    *
    * Scale shape: two hash aggregates build the bucket tables (bounded
    * at `nBuckets` rows — broadcast-sized BY CONSTRUCTION, unlike a raw
    * vocabulary), one broadcast join scores the corpus, one per-doc
    * re-aggregate. No all-pairs anything; the only data-sized shuffles
    * key on doc_id. Docs with no features (null text, <2 tokens)
    * surface with `n_feat = 0, keep = false`.
    */
  def dsirSelect(spark: SparkSession, dir: String, nBuckets: Int = 256,
      targetLang: String = "en"): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val Scale = 1000000L
    val base = docs(spark, dir).select(col("doc_id"), col("lang"),
      when(col("text").isNull, lit(null)).otherwise(tokens(col("text")))
        .as("t"))
    val feats = base.filter(col("t").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.ShingleArray.shingle_array_all(col("t"), 2))
          .as("bg"))
      .select(col("doc_id"), col("lang"),
        pmod(poly_hash(col("bg")), lit(nBuckets.toLong)).as("b"))
    val tgt = feats.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("t_cnt"))
    val src = feats.groupBy(col("b")).agg(count(lit(1)).as("s_cnt"))
    val wt = src.join(tgt, Seq("b"), "left")
      .select(col("b"),
        expr(s"(coalesce(t_cnt, 0) + 1) * $Scale DIV (s_cnt + 1)")
          .as("wt"))
    val docW = feats.join(broadcast(wt), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"), sum(col("wt")).as("dsir_weight"))
    val stats = docW.agg(
      expr("CAST(sum(CAST(dsir_weight AS DECIMAL(38,0))) DIV " +
        "sum(CAST(n_feat AS DECIMAL(38,0))) AS BIGINT)").as("mu"))
    base.select(col("doc_id")).join(docW, Seq("doc_id"), "left")
      .crossJoin(stats)
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("dsir_weight"), lit(0L)).as("dsir_weight"),
        (coalesce(col("dsir_weight"), lit(0L)) >
          col("mu") * coalesce(col("n_feat"), lit(0L))).as("keep"))
  }
}
