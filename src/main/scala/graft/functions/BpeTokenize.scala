package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization of a document in one codegen'd pass:
  * whitespace pre-tokenization (`\s+`, matching the oracle's
  * `regexp_split_to_array`), then per word the greedy merge loop every
  * production tokenizer runs — repeatedly merge the adjacent symbol pair
  * with the LOWEST merge rank until no pair is in the merge table.
  *
  * The loop is pinned to the ONE-AT-A-TIME form (merge the lowest-rank
  * pair's LEFTMOST occurrence, then re-scan): for any vocabulary where a
  * merge producing a token precedes every merge consuming it — true of
  * every BPE vocabulary by construction, since a pair can only be counted
  * during training after both members exist — this is provably identical
  * to the textbook all-occurrences-per-round form (a spec pins the
  * equivalence on the fixture vocab), and it is the form a SQL oracle can
  * replay verbatim (one recursive-CTE step per merge).
  *
  * Scale shape: a narrow per-row projection — no shuffle, no UDF
  * serialization boundary; the merge table rides into executors inside
  * the expression (`ctx.addReferenceObj`, the [[NearestCentroid]]
  * pattern) and a per-process word→tokens memo (bounded, concurrent)
  * makes the amortized cost per word O(1) for natural-language corpora
  * whose running vocabulary is tiny next to their token count. At 100 TB
  * this runs at scan speed like the rest of the text family.
  */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)],
    augmentAdjacent: Boolean = false)
    extends UnaryExpression {

  require(merges.nonEmpty, "merge table must not be empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val codec = BpeCodec.canonical(merges)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_tokenize requires STRING input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    if (augmentAdjacent) codec.encodeDocAugmented(input.asInstanceOf[UTF8String])
    else codec.encodeDoc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef =
      ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    val method = if (augmentAdjacent) "encodeDocAugmented" else "encodeDoc"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $codecRef.$method($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)

  override def prettyName: String = "bpe_tokenize"
}

object BpeTokenize {
  def bpe_tokenize(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.toColumn(BpeTokenize(GraftBridge.toExpression(text), merges))

  /** BPE over the ADJACENT-AUGMENTED word stream — equivalent to
    * `bpe_tokenize(array_join(concat(words, adjacent_pairs), ' '))` where
    * `words` is the whitespace split and `adjacent_pairs` the in-order
    * `w_i || w_{i+1}` concatenations, but built imperatively in the same
    * single codegen'd pass as the encode. The declarative HOF form
    * ([[graft.ext.text.TextAnalysis.bpeAugmentedText]], kept as the
    * oracle-documented spec of the stream) re-evaluates the word-array
    * subexpression on every `element_at` inside the lambda — O(words²)
    * regex splits per row, ~10 s over 5k sf0.1 docs; this form is one
    * split per row and runs at scan speed.
    */
  def bpe_tokenize_augmented(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.toColumn(BpeTokenize(GraftBridge.toExpression(text), merges,
      augmentAdjacent = true))
}

/** The merge table + encode loop, shared between interpreted eval and the
  * generated code (which holds it as a plan reference object). The
  * word→tokens memo is per-codec, thread-safe (executor threads share the
  * plan's reference array), and approximately bounded: past
  * [[BpeCodec.MemoCap]] distinct words new entries are computed but not
  * inserted (the size-check-then-put is deliberately non-atomic, so
  * concurrent threads can overshoot the cap by at most the thread count
  * — bounded drift, not growth), so an adversarial high-entropy corpus
  * degrades to cache-miss cost instead of growing executor memory.
  */
final class BpeCodec(merges: Seq[(String, String)]) extends Serializable {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // a space never appears inside a symbol (symbols come from
      // whitespace-split words), so the joined key is collision-free
      m.put(l + " " + r, i)
    }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  def encodeDoc(text: UTF8String): ArrayData = {
    val s = text.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = s.split("\\s+")
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < words.length) {
      val toks = encodeWord(words(i))
      var j = 0
      while (j < toks.length) { out.add(toks(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Encode the adjacent-augmented stream of `text`: every whitespace
    * word in order, then every in-order adjacent concatenation
    * `w_i || w_{i+1}` — byte-identical to encoding
    * `array_join(concat(words, pairs), ' ')` (the declarative
    * `bpeAugmentedText` spec) but with ONE split per document.
    */
  def encodeDocAugmented(text: UTF8String): ArrayData = {
    val s = text.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = s.split("\\s+")
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < words.length) {
      val toks = encodeWord(words(i))
      var j = 0
      while (j < toks.length) { out.add(toks(j)); j += 1 }
      i += 1
    }
    i = 0
    while (i < words.length - 1) {
      val toks = encodeWord(words(i) + words(i + 1))
      var j = 0
      while (j < toks.length) { out.add(toks(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(w: String): Array[UTF8String] = {
    val cached = memo.get(w)
    if (cached != null) return cached
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      // code-point-aware split so multi-byte text never tears a char
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var p = 0
      while (p < syms.size - 1) {
        val r = ranks.get(syms.get(p) + " " + syms.get(p + 1))
        if (r != null && r < bestRank) { bestRank = r; bestPos = p }
        p += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
      }
    }
    val out = new Array[UTF8String](syms.size)
    i = 0
    while (i < syms.size) { out(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    if (memo.size < BpeCodec.MemoCap) memo.putIfAbsent(w, out)
    out
  }

  /** Deserialization resolves to the process-canonical instance for this
    * merge table, so every plan (and every task deserialization of the
    * same plan) shares ONE word→tokens memo per vocabulary instead of
    * re-warming a private memo per expression instance.
    */
  private def readResolve(): Object = BpeCodec.canonical(merges)
}

object BpeCodec {
  /** Distinct-word memo bound — ~64k words × a few tokens each stays in
    * single-digit MB per executor; real vocabularies fit with room over.
    */
  val MemoCap = 1 << 16

  /** Canonical-instance bound: real jobs use a handful of vocabularies,
    * but per-query generated merge tables must not pin codecs (each with
    * a [[MemoCap]]-bounded word memo) for the life of the executor JVM —
    * past the bound the least-recently-used codec is dropped.
    */
  val CanonicalCap = 8

  private val instances =
    new graft.util.LruMemo[Seq[(String, String)], BpeCodec](CanonicalCap)

  /** The process-wide codec for `merges` — one memo per vocabulary per
    * JVM (LRU-bounded by [[CanonicalCap]]; each codec's word memo
    * bounded by [[MemoCap]]), shared across all expressions and tasks.
    * Built outside the memo lock; a racing duplicate build is benign.
    */
  def canonical(merges: Seq[(String, String)]): BpeCodec =
    instances.get(merges).getOrElse(
      instances.putIfAbsent(merges, new BpeCodec(merges)))
}
