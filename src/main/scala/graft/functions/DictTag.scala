package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern dictionary tagging in ONE codegen'd pass: per document,
  * the occurrence count of every dictionary entry (ALL occurrences,
  * overlapping included — every text position where an entry ends),
  * via a classic Aho–Corasick automaton. This is the curation
  * blocklist/topic-tagging primitive: where `k` separate
  * `LIKE '%kw%'` predicates scan the text `k` times, the automaton
  * walks it ONCE regardless of dictionary size — at 100 TB the
  * difference between a dictionary-sized and a constant number of
  * passes over the corpus.
  *
  * Scale shape: a narrow per-row projection — no shuffle, no UDF
  * boundary; the automaton rides into executors as a plan reference
  * object ([[BpeTokenize]]'s pattern) and is process-canonical per
  * dictionary, so every task shares one transition table.
  */
case class DictTagCounts(child: Expression, dict: Seq[String])
    extends UnaryExpression {

  require(dict.nonEmpty && dict.forall(_.nonEmpty),
    "dictionary must be non-empty strings")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val ac = AcAutomaton.canonical(dict)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dict_tag_counts requires STRING input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ac.countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $acRef.countsOf($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): DictTagCounts =
    copy(child = newChild)

  override def prettyName: String = "dict_tag_counts"
}

object DictTagCounts {
  def dict_tag_counts(text: Column, dict: Seq[String]): Column =
    GraftBridge.toColumn(
      DictTagCounts(GraftBridge.toExpression(text), dict))
}

/** Textbook Aho–Corasick (goto/fail/output over UTF-16 units — the
  * fixture dictionary is ASCII, and an ASCII pattern can never straddle
  * a surrogate pair, so char-level matching counts exactly the
  * code-point occurrences an oracle's character slicing sees). Built
  * once per dictionary per process ([[AcAutomaton.canonical]]);
  * transitions are per-node hash maps (the dictionary is small — a
  * blocklist, not a corpus), with output lists flattened to arrays for
  * the scan loop.
  */
final class AcAutomaton(dict: Seq[String]) extends Serializable {

  @transient private lazy val (gotoMaps, fail, outs):
      (Array[java.util.HashMap[Character, Integer]], Array[Int],
        Array[Array[Int]]) = {
    val gm = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outLists = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    dict.zipWithIndex.foreach { case (w, wi) =>
      var node = 0
      w.foreach { ch =>
        val next = gm(node).get(ch)
        if (next != null) node = next
        else {
          gm += new java.util.HashMap[Character, Integer]()
          outLists += scala.collection.mutable.ArrayBuffer.empty[Int]
          gm(node).put(ch, gm.size - 1)
          node = gm.size - 1
        }
      }
      outLists(node) += wi
    }
    val failArr = new Array[Int](gm.size)
    val queue = new java.util.ArrayDeque[Int]()
    gm(0).forEach((_, v) => { failArr(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      gm(u).forEach { (ch, v) =>
        queue.add(v)
        var f = failArr(u)
        while (f != 0 && gm(f).get(ch) == null) f = failArr(f)
        val fNext = gm(f).get(ch)
        failArr(v) =
          if (fNext != null && fNext != v) fNext.intValue else 0
        outLists(v) ++= outLists(failArr(v))
      }
    }
    (gm.toArray, failArr, outLists.map(_.toArray).toArray)
  }

  def countsOf(text: UTF8String): ArrayData = {
    val counts = new Array[Int](dict.size)
    val s = text.toString
    var node = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      while (node != 0 && gotoMaps(node).get(ch) == null) node = fail(node)
      val next = gotoMaps(node).get(ch)
      node = if (next != null) next.intValue else 0
      val o = outs(node)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts.map(Int.box(_): AnyRef))
  }

  private def readResolve(): Object = AcAutomaton.canonical(dict)
}

object AcAutomaton {
  /** Canonical-instance bound: dictionaries are normally process-static
    * fixtures (a handful per job), but a caller generating distinct
    * per-query lists must not grow automatons for the life of the
    * executor JVM — past the bound the least-recently-used automaton is
    * dropped and would simply be rebuilt on next use.
    */
  val CanonicalCap = 32

  private val instances =
    new graft.util.LruMemo[Seq[String], AcAutomaton](CanonicalCap)

  /** The process-wide automaton for `dict` — one transition table per
    * dictionary per JVM (LRU-bounded by [[CanonicalCap]]), shared
    * across all expressions and tasks. Built outside the memo lock; a
    * racing duplicate build is benign (identical automatons, loser
    * dropped).
    */
  def canonical(dict: Seq[String]): AcAutomaton =
    instances.get(dict).getOrElse(
      instances.putIfAbsent(dict, new AcAutomaton(dict)))
}
