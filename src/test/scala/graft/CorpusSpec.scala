package graft

import org.apache.spark.sql.functions._
import graft.ext.corpus.Corpus
import graft.ext.dedup.TextDedup

class CorpusSpec extends SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("perKeySample: k per source, hash-stable, heap-agg plan") {
    val out = Corpus.perKeySample(spark, dir, k = 5)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length)) // dense ranks
    }
    // identical on re-run (hash-determined, no rand())
    val again = Corpus.perKeySample(spark, dir, k = 5).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
    // bounded heap aggregate, not a per-key window sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("dsir: smoothed bucket ratios, target-like features weigh more") {
    val scratch = graft.util.Scratch.dir("graft_dsir").toString
    import spark.implicits._
    // target (en) bigrams: "x y"×2, "y x"×1; corpus adds "q r"×2, "r q"×1
    Seq((1L, "x y x y", "en"), (2L, "x y", "de"), (3L, "q r q r", "de"),
      (4L, null.asInstanceOf[String], "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
    val out = Corpus.dsirSelect(spark, scratch).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // wt(x y) = 3e6 div 4 = 750000, wt(y x) = 2e6 div 2 = 1000000,
    // wt(q r) = 1e6 div 3 = 333333, wt(r q) = 1e6 div 2 = 500000
    // (exact unless two of the four bigrams collide in 256 buckets —
    // poly_hash is deterministic, so this assert would catch that)
    assert(out(1L).getAs[Long]("dsir_weight") == 2500000L)
    assert(out(2L).getAs[Long]("dsir_weight") == 750000L)
    assert(out(3L).getAs[Long]("dsir_weight") == 1166666L)
    // per-feature: the target-like doc outweighs the off-target one
    assert(out(2L).getAs[Long]("dsir_weight") * out(3L).getAs[Long]("n_feat")
      > out(3L).getAs[Long]("dsir_weight") * out(2L).getAs[Long]("n_feat"))
    // keep = mean per-feature weight clears the corpus mean
    // mu = 4416666 div 7 = 630952; doc 1: 2500000 > 3·mu, doc 2 (the
    // short but purely target-like doc): 750000 > mu, doc 3: 1166666 < 3·mu
    assert(out(1L).getAs[Boolean]("keep") && out(2L).getAs[Boolean]("keep")
      && !out(3L).getAs[Boolean]("keep"))
    // featureless docs surface, never vanish
    assert(out(4L).getAs[Long]("n_feat") == 0L &&
      !out(4L).getAs[Boolean]("keep"))
    // on the corpus the selection is non-vacuous and favors the target lang
    val byLang = Corpus.dsirSelect(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(when(col("keep"), 1.0).otherwise(0.0)))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en keep-rate should exceed non-en: $byLang")
  }

  test("prepare funnel counts are monotone and consistent with the stages") {
    val rows = Corpus.prepare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nIn, q, d, k) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nIn >= q && q >= d && d >= k)
      // chunks and tokens only from kept docs; 24-token stride floor
      assert(r.getLong(5) >= k)
      assert(r.getLong(6) >= r.getLong(5))
    }
    // dedup stage drops exactly the non-canonical members that pass quality
    val totalIn = rows.map(_.getLong(1)).sum
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(totalIn == docs)
  }

  test("stratified sample is deterministic and near the target rate") {
    val a = Corpus.stratifiedSample(spark, dir)
    val b = Corpus.stratifiedSample(spark, dir)
    assert(a.collect().map(_.getLong(0)).sorted
      .sameElements(b.collect().map(_.getLong(0)).sorted))
    val total = spark.read.parquet(s"$dir/documents.parquet").count().toDouble
    val rate = a.count() / total
    assert(rate > 0.08 && rate < 0.35, s"rate $rate far from 0.20")
    // sampled sources are a subset of the corpus sources (the strata key
    // is (source, doc_id); coverage of every source is a large-N property,
    // not guaranteed on a 50-doc fixture)
    val srcAll = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val srcSampled = a.select("source").distinct().collect()
      .map(_.getString(0)).toSet
    assert(srcSampled.subsetOf(srcAll) && srcSampled.nonEmpty)
  }

  test("shard packing: shards fill to budget, overshoot bounded by one doc") {
    val budget = 500L
    val shards = Corpus.packShards(spark, dir, budget).collect()
    assert(shards.nonEmpty)
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), size(split(trim(col("text")), " ")).as("n"))
    val maxDoc = docsDf.agg(max("n")).collect().head.getInt(0)
    shards.foreach { r =>
      val tokens = r.getAs[Long]("shard_tokens")
      // a shard never exceeds budget + one max-sized document
      assert(tokens <= budget + maxDoc, s"overfull shard: $r")
    }
    // token conservation: shards partition the corpus exactly
    val packed = shards.map(_.getAs[Long]("shard_tokens")).sum
    val total = docsDf.agg(sum("n")).collect().head.getLong(0)
    assert(packed == total)
  }

  test("sequence packing: chunk conservation, overflow bounded by one chunk") {
    val seqLen = 64L
    val seqs = Corpus.packSequences(spark, dir, seqLen).collect()
    assert(seqs.nonEmpty)
    // every chunk lands in exactly one sequence: token totals must match
    val chunkTotal = graft.ext.text.TextAnalysis
      .chunkTokens(spark.read.parquet(s"$dir/documents.parquet"))
      .agg(sum(col("n_chunk_tokens"))).collect().head.getLong(0)
    assert(seqs.map(_.getAs[Long]("seq_tokens")).sum == chunkTotal)
    // overflow is the last chunk's spill: strictly under one chunk size
    seqs.foreach { r =>
      val ov = r.getAs[Long]("overflow_tokens")
      assert(ov >= 0 && ov < graft.ext.text.TextAnalysis.ChunkSize,
        s"overflow out of bounds: $r")
    }
    // a sequence's fill can exceed seqLen only by its overflow
    seqs.foreach { r =>
      assert(r.getAs[Long]("seq_tokens") <=
        seqLen + r.getAs[Long]("overflow_tokens"), s"overfull: $r")
    }
  }

  test("temperature mixture sits between natural and uniform mixes") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = counts.values.min
    val mix = Corpus.temperatureMixture(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    val uni = Corpus.rebalance(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    counts.foreach { case (lang, n) =>
      val kept = mix(lang)
      // expected sqrt-rate target with binomial slack
      val target = math.sqrt(minN.toDouble / n) * n
      assert(kept >= target / 2 && kept <= target * 2,
        s"$lang kept $kept vs sqrt-target $target")
      // alpha=0.5 keeps at least the uniform mix and at most the corpus
      assert(kept >= uni(lang) - 2 && kept <= n, s"$lang out of band")
    }
    // monotone in size: bigger languages keep MORE than smaller ones
    // under temperature (unlike uniform, which flattens them)
    val sorted = counts.toSeq.sortBy(_._2).map { case (l, _) => mix(l) }
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b + 2 })
  }

  test("tfidf top term prefers rare terms over common ones") {
    import spark.implicits._
    val tmp = tmpDir("tfidf")
    Seq(
      (1L, "common common common rare rare", "s"),
      (2L, "common words here too", "s"),
      (3L, "common words everywhere now", "s")
    ).toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val top = Corpus.tfidfTopTerms(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: "rare" (tf 2, df 1 -> score 6) beats "common" (tf 3, df 3 -> 3)
    assert(top(1L) == "rare")
  }

  test("duplicated spans surface shared boilerplate") {
    import spark.implicits._
    val tmp = tmpDir("spans")
    val boiler = (1 to 13).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, s"$boiler alpha beta", "s"),
      (2L, s"$boiler gamma delta", "s"),
      (3L, "entirely different words with no shared run of thirteen tokens " +
        "one two three four five six seven", "s")
    ).toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val spans = TextDedup.duplicatedSpans(spark, tmp).collect()
    assert(spans.exists(r => r.getString(0) == boiler &&
      r.getAs[Long]("n_docs") == 2L))
  }

  test("rebalance equalizes the language mix deterministically") {
    def kept(): Map[String, (Long, Long)] =
      graft.ext.corpus.Corpus.rebalance(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("sum_ids"))).toMap
    val a = kept()
    assert(a == kept()) // content-addressed selection: bit-identical reruns
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = counts.values.min
    // the smallest language is kept whole (threshold = grain exactly);
    // every other language lands near min_n (binomial spread)
    val minLang = counts.minBy(_._2)._1
    assert(a(minLang)._1 == minN)
    a.foreach { case (lang, (n, _)) =>
      assert(n <= counts(lang))
      assert(n >= minN / 2 && n <= minN * 2,
        s"$lang kept $n, expected near $minN")
    }
  }

  test("corpus overlap: sketch tracks exact jaccard, invariants hold") {
    val r = Corpus.corpusOverlap(spark, dir).collect().head
    val m = r.getAs[Int]("m")
    val matches = r.getAs[Long]("slot_matches")
    val est = r.getAs[Long]("est_permille")
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val shared = r.getAs[Long]("n_shared")
    val exact = r.getAs[Long]("exact_permille")
    assert(m == 64 && matches >= 0 && matches <= m)
    assert(shared <= math.min(na, nb))
    assert(est == 1000L * matches / m)
    assert(exact == 1000L * shared / (na + nb - shared))
    // Broder's estimator at m=64: SE ≈ sqrt(J(1-J)/64) ≈ 55‰ for the
    // fixture's J ≈ 0.25; this deterministic draw lands within 150‰
    assert(math.abs(est - exact) <= 150, s"est $est vs exact $exact")
    // content-addressed: bit-identical rerun
    assert(Corpus.corpusOverlap(spark, dir).collect().head == r)
  }

  test("curriculum shards: histogram-first rank equals the global sort") {
    import org.apache.spark.sql.expressions.Window
    val k = 16
    val out = Corpus.curriculumShards(spark, dir, k).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("min_score"), r.getAs[Long]("max_score"),
        r.getAs[Long]("sum_ids"))).sortBy(_._1)
    // the naive form the decomposition must reproduce exactly: one
    // global row_number (fine at test scale, a one-partition funnel at
    // 100 TB — which is the whole point of the histogram-first shape)
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        coalesce(col("n_chars").cast("long"), lit(-1L)).as("score"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score"), col("doc_id"))))
      .crossJoin(spark.read.parquet(s"$dir/documents.parquet")
        .agg(count(lit(1)).as("n_total")))
      .withColumn("shard", expr(s"CAST((rn - 1) * $k DIV n_total AS INT)"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), min(col("score")).as("min_score"),
        max(col("score")).as("max_score"), sum(col("doc_id")).as("sum_ids"))
      .collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("min_score"), r.getAs[Long]("max_score"),
        r.getAs[Long]("sum_ids"))).sortBy(_._1)
    assert(out.sameElements(naive))
    // k balanced shards over contiguous, non-overlapping score ranges
    assert(out.length == k)
    assert(out.map(_._2).max - out.map(_._2).min <= 1,
      "shard sizes must differ by at most one")
    out.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"shard ${lo._1} overlaps ${hi._1}")
    case _ => ()
    }
  }

  test("training shuffle: complete partition, deterministic, not id order") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()
    val out = Corpus.trainingShuffle(spark, dir).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_ids"), r.getAs[Long]("order_sum")))
      .sortBy(_._1)
    // every document in exactly one shard (counts and id-sums partition)
    assert(out.map(_._2).sum == total)
    assert(out.map(_._3).sum ==
      docs.agg(sum(col("doc_id"))).collect().head.getLong(0))
    // md5 splits ~evenly across 8 shards (binomial: ±5 sigma at n=50/shard)
    val expect = total / 8.0
    out.foreach { case (s, n, _, _) =>
      assert(math.abs(n - expect) < 5 * math.sqrt(expect),
        s"shard $s count $n vs expected ~$expect") }
    // content-addressed: bit-identical rerun
    val again = Corpus.trainingShuffle(spark, dir).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_ids"), r.getAs[Long]("order_sum")))
      .sortBy(_._1)
    assert(out.sameElements(again))
    // the within-shard order is a real permutation, not doc_id order:
    // order_sum must differ from the id-ordered checksum in some shard
    val byId = docs.select(col("doc_id"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), " +
          "16, 10) AS BIGINT) % 8").cast("int").as("shard"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("doc_id"))))
      .groupBy(col("shard"))
      .agg(sum(expr("CAST(pos AS BIGINT) * doc_id")).as("order_sum"))
      .collect().map(r => (r.getAs[Int]("shard"),
        r.getAs[Long]("order_sum"))).toMap
    assert(out.exists { case (s, _, _, os) => byId(s) != os },
      "hash order coincides with doc_id order in every shard")
  }
}
