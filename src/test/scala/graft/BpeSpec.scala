package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ext.text.TextAnalysis
import graft.functions.{BpeCodec, BpeTokenize}

/** BPE tokenization: the codegen'd expression vs a plain-Scala textbook
  * reference, the one-at-a-time ≡ all-occurrences equivalence the oracle
  * leans on, null/edge handling, and the packing gate's conservation law.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** Textbook (HuggingFace-style) encoder: per round, find the lowest-rank
    * adjacent pair anywhere in the word and merge ALL its occurrences
    * left to right.
    */
  private def encodeAllAtOnce(w: String,
      merges: Seq[(String, String)]): List[String] = {
    val ranks = merges.zipWithIndex.toMap
    var syms = w.map(_.toString).toList
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.zip(syms.tail).flatMap(p => ranks.get(p))
      if (present.isEmpty) done = true
      else {
        val (l, r) = merges(present.min)
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toList
      }
    }
    syms
  }

  /** The engine's (and oracle's) form: merge the lowest-rank pair's
    * LEFTMOST occurrence, one merge per step.
    */
  private def encodeOneAtATime(w: String,
      merges: Seq[(String, String)]): List[String] = {
    val ranks = merges.zipWithIndex.toMap
    var syms = w.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val rks = syms.zip(syms.tail).map(ranks.get)
      val best = rks.flatten.minOption
      best match {
        case None => done = true
        case Some(b) =>
          val p = rks.indexOf(Some(b))
          syms = (syms.take(p) :+ (syms(p) + syms(p + 1))) ++ syms.drop(p + 2)
      }
    }
    syms.toList
  }

  /** Train a textbook BPE vocab on a word-frequency table (the procedure
    * that produced the hardcoded fixture): merge the frequency-maximal
    * adjacent pair each step, lexicographic tie-break.
    */
  private def train(freq: Map[String, Int], nMerges: Int): Seq[(String, String)] = {
    var vocab = freq.keys.map(w => w -> w.map(_.toString).toList).toMap
    val merges = scala.collection.mutable.ListBuffer[(String, String)]()
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- vocab; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + freq(w)
      if (counts.isEmpty) exhausted = true
      else {
        val maxC = counts.values.max
        // NOTE: `counts.collect { case (p, c) if c == maxC => p }` is a
        // trap here — on a Map, collect with pair-typed results builds a
        // MAP, so tied pairs sharing a left symbol collapse to one
        // arbitrary survivor (found when the 500-merge fixture hit a
        // {(merge,sort), (merge,stream)} tie). keys-after-filter keeps
        // the full tie set.
        val best = counts.filter(_._2 == maxC).keys
          .toSeq.sortBy(p => (p._1, p._2)).head
        merges += best
        val (l, r) = best
        vocab = vocab.map { case (w, syms) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.toList
        }
        step += 1
      }
    }
    merges.toSeq
  }

  test("bpe_tokenize == the all-at-once textbook reference (fixture vocab)") {
    val word = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ 'é')).map(_.mkString))
    val doc = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val texts = samples(doc, 150) ++ Seq("", "   ", "customer  filter\tjoin",
      "the quick brown fox", "ééé batch")
    val merges = TextAnalysis.BpeFixtureMerges
    val got = texts.toDF("text")
      .select(BpeTokenize.bpe_tokenize(col("text"), merges))
      .collect().map(_.getSeq[String](0).toList).toSeq
    val want = texts.map(_.trim.split("\\s+").filter(_.nonEmpty).toList
      .flatMap(w => encodeAllAtOnce(w, merges)))
    assert(got == want, got.zip(want).zipWithIndex.collectFirst {
      case ((g, w), i) if g != w => s"row $i '${texts(i)}': $g vs $w" }.toString)
  }

  test("one-at-a-time leftmost == all-at-once for TRAINED vocabs (random)") {
    // the oracle replays one merge per recursive step; its agreement with
    // the textbook loop holds for any vocab where a merge producing a
    // token precedes the merges consuming it — true of every trained
    // vocab. Pin it on freshly trained vocabs over random corpora.
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a' to 'f')).map(_.mkString))
    for (seed <- 0 until 10) {
      val ws = samples(word, 30).zipWithIndex
        .map { case (w, i) => (w, i % 7 + 1) }
      val freq = ws.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
      val merges = train(freq, 25)
      val probe = samples(word, 40) ++ freq.keys
      probe.foreach { w =>
        assert(encodeOneAtATime(w, merges) == encodeAllAtOnce(w, merges),
          s"seed=$seed w=$w merges=$merges")
      }
    }
  }

  test("fixture merges reproduce on retraining from the sf0.001 corpus shape") {
    // the fixture list must stay a real trained artifact: retraining on
    // the corpus's word frequencies with the recorded procedure yields a
    // PREFIX-compatible sequence (the exact table was trained at sf0.01;
    // here we only pin that the procedure and tie-break are the recorded
    // ones by checking the first merges on a hand-built frequency table)
    val freq = Map("the" -> 840, "merge" -> 918, "order" -> 912,
      "filter" -> 933, "stream" -> 888, "vector" -> 912)
    val merges = train(freq, 3)
    // 'er' dominates this sub-table (merge+order+filter+vector share it)
    assert(merges.head == ("e" -> "r"), merges.toString)
  }

  test("bpe gate: nulls and blanks surface as zero counts, never vanish") {
    val scratch = graft.util.Scratch.dir("graft_bpe_null").toString
    Seq((0L, "customer join", "en", "s0", 13L),
        (1L, null.asInstanceOf[String], "en", "s0", 0L),
        (2L, "   ", "en", "s0", 3L),
        (3L, "", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
    val rows = TextAnalysis.bpeReport(spark, scratch)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // augmented stream: words + the adjacent concatenation; all three are
    // single tokens in the 500-merge vocab
    assert(rows(0L) == ((3, 3, "customer|join|customerjoin")))
    assert(rows(1L) == ((0, 0, "")))
    assert(rows(2L) == ((0, 0, "")))
    assert(rows(3L) == ((0, 0, "")))
  }

  test("bpe codegen compiles (no silent interpreted fallback)") {
    // compile the generated Java directly — a Janino rejection must fail
    // loudly here, not degrade the scan path quietly (same contract as
    // the WinnowFp codegen spec)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = BpeTokenize(
      BoundReference(0, StringType, nullable = true),
      TextAnalysis.BpeFixtureMerges)
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(UTF8String.fromString("customer the")))
    val arr = out.getArray(0)
    assert((0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      == Seq("customer", "t", "h", "e"))
  }

  test("packSequencesBpe conserves tokens and bounds overflow") {
    val dir = "/root/testdata/sf0.001"
    val packed = graft.ext.corpus.Corpus.packSequencesBpe(spark, dir)
    val total = packed.agg(sum("seq_tokens")).collect()(0).getLong(0)
    val direct = TextAnalysis.bpeReport(spark, dir)
      .agg(sum(col("n_bpe_tokens").cast("long"))).collect()(0).getLong(0)
    assert(total == direct, s"packed $total vs direct $direct")
    // every sequence except possibly a source's last must fill past the
    // boundary or carry overflow 0 within it; overflow is never negative
    assert(packed.filter(col("overflow_tokens") < 0).count() == 0)
    // doc membership conserved
    val nDocs = packed.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(nDocs == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("distributed bpeTrain reproduces the offline-trained fixture at sf0.01") {
    // the fixture list was trained by an INDEPENDENT offline
    // implementation of the same procedure; the Spark trainer must
    // reproduce it merge for merge on the same corpus
    val got = TextAnalysis.bpeTrain(spark, "/root/testdata/sf0.01", 40)
    assert(got == TextAnalysis.BpeFixtureMerges,
      got.zip(TextAnalysis.BpeFixtureMerges).zipWithIndex.collectFirst {
        case ((g, w), i) if g != w => s"first divergence at merge $i: $g vs $w"
      }.toString)
  }

  test("BpeFixture500 reproduces from the sf0.1 augmented stream") {
    // the frozen 500-merge vocab was trained OFFLINE by the independent
    // tools/bpe_train_offline.py; the plain-Scala trainer here must
    // reproduce it merge for merge from the Spark-computed augmented
    // word-frequency table (962 distinct words), and the distributed
    // trainer must agree on a prefix (full 500 Spark iterations would
    // be spec-budget-hostile; prefix + the random-corpus equivalence
    // test below cover the loop)
    val freq = TextAnalysis.augmentedWordFreq(spark, "/root/testdata/sf0.1")
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(freq.size == 962, s"augmented vocab drifted: ${freq.size}")
    val want = train(freq, 500)
    assert(want == graft.ext.text.BpeFixture500.Merges,
      want.zip(graft.ext.text.BpeFixture500.Merges).zipWithIndex.collectFirst {
        case ((g, w), i) if g != w => s"first divergence at merge $i: $g vs $w"
      }.toString)
    val dist = TextAnalysis.bpeTrainAugmented(spark, "/root/testdata/sf0.1", 25)
    assert(dist == graft.ext.text.BpeFixture500.Merges.take(25))
  }

  test("distributed bpeTrain == the plain-Scala trainer on random corpora") {
    val word = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a' to 'e')).map(_.mkString))
    for (seed <- 0 until 3) {
      val ws = samples(word, 40).zipWithIndex
        .map { case (w, i) => (w, (i % 5 + 1).toLong) }
      val freq = ws.groupBy(_._1)
        .map { case (w, g) => w -> g.map(_._2).sum }.toSeq
      val wf = freq.toDF("w", "freq")
      val got = TextAnalysis.bpeTrainOnVocab(wf, 15)
      val want = train(freq.map { case (w, f) => w -> f.toInt }.toMap, 15)
      assert(got == want, s"seed=$seed: $got vs $want")
    }
  }

  test("bpeTrain: empty and single-char corpora yield what they can") {
    val empty = TextAnalysis.bpeTrainOnVocab(
      Seq.empty[(String, Long)].toDF("w", "freq"), 5)
    assert(empty.isEmpty)
    val single = TextAnalysis.bpeTrainOnVocab(
      Seq(("a", 10L), ("b", 3L)).toDF("w", "freq"), 5)
    assert(single.isEmpty, s"no pairs exist in 1-char words: $single")
    val two = TextAnalysis.bpeTrainOnVocab(
      Seq(("ab", 2L), ("ba", 1L)).toDF("w", "freq"), 5)
    assert(two.head == ("a" -> "b"), two.toString)
  }

  test("bpe round trip: concatenating a word's tokens reproduces the word") {
    // tokenization must be LOSSLESS segmentation — merges only ever join
    // adjacent symbols, so the concatenation of each word's tokens is the
    // word, and the doc-level token stream concatenates to the
    // whitespace-normalized document
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ 'ß')).map(_.mkString))
    val doc = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val texts = samples(doc, 80)
    val got = texts.toDF("text")
      .select(concat_ws("", TextAnalysis.bpeTokens(col("text"))))
      .collect().map(_.getString(0)).toSeq
    assert(got == texts.map(_.trim.split("\\s+").mkString("")))
  }

  test("bpe memo cap: encoding stays correct past the bound") {
    val codec = new BpeCodec(Seq("a" -> "b"))
    // drive distinct words through; results must be identical regardless
    // of memo hits/misses
    val r1 = (0 until 100).map { i =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s"ab$i")
      val a = codec.encodeDoc(u)
      (0 until a.numElements()).map(a.getUTF8String(_).toString).toList
    }
    val r2 = (0 until 100).map { i =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s"ab$i")
      val a = codec.encodeDoc(u)
      (0 until a.numElements()).map(a.getUTF8String(_).toString).toList
    }
    assert(r1 == r2)
    assert(r1(3).take(1) == List("ab"))
  }

  test("imperative augmented encode == declarative bpeAugmentedText form") {
    // bpeTokens500 now augments inside the codec (one split per row); it
    // must stay token-identical to tokenizing the declarative
    // bpeAugmentedText stream — the form the oracle SQL replays.
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ 'é')).map(_.mkString))
    val doc = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val texts: Seq[String] = samples(doc, 120) ++ Seq("", "   ", "one",
      "customer  filter\tjoin", "the quick brown fox", null)
    val merges = graft.ext.text.BpeFixture500.Merges
    val df = texts.toDF("text")
    val fast = df.select(TextAnalysis.bpeTokens500(col("text")))
      .collect().map(_.getSeq[String](0).toList).toSeq
    val slow = df.select(BpeTokenize.bpe_tokenize(
        TextAnalysis.bpeAugmentedText(col("text")), merges))
      .collect().map(_.getSeq[String](0).toList).toSeq
    assert(fast == slow, fast.zip(slow).zipWithIndex.collectFirst {
      case ((f, s), i) if f != s => s"row $i '${texts(i)}': $f vs $s" }.toString)
  }
}
