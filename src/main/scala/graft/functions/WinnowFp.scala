package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a token array in ONE codegen'd pass: the
  * distinct minima of each `w`-gram-window of k-gram [[PolyHash]]es
  * (Schleimer, Wilkerson & Aiken 2003 — see
  * [[graft.ext.text.TextAnalysis.winnowFingerprints]] for the
  * guarantee and its consumers).
  *
  * Fuses the three-step declarative chain
  * `transform(shingle_array_all(t, k), s -> poly_hash(s))` →
  * `transform(sequence(...), i -> array_min(slice(gh, i, w)))` →
  * `array_distinct` — three nested lambda HOFs that Spark always
  * evaluates interpreted (no `doGenCode` on lambda functions), exactly
  * the gap [[ShingleArray]] documents. The fused form never
  * materializes the gram strings at all: each gram's hash folds the
  * member tokens' UTF-8 bytes with a single 0x20 between them —
  * byte-identical to `PolyHash` of the space-joined gram (null tokens
  * are skipped WITH their separator, matching `UTF8String.concatWs`,
  * the joiner the HOF chain uses).
  *
  * Semantics (must stay bit-identical to the HOF chain — a property
  * test pins it):
  *  - fewer than k tokens → empty array (no grams);
  *  - g = #grams = len − k + 1; windows start at 0 .. max(0, g − w)
  *    (a document with fewer than w grams gets ONE window covering all
  *    of them — the standard winnowing boundary choice);
  *  - each window's minimum is selected; duplicates are dropped in
  *    first-occurrence order (order is irrelevant to the order-free
  *    consumers but pinned for the parity test).
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fp requires ARRAY<STRING> input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < k) return new GenericArrayData(Array.empty[Any])
    val g = sz - k + 1
    // per-gram hashes
    val gh = new Array[Long](g)
    var i = 0
    while (i < g) {
      gh(i) = WinnowFp.gramHash(arr, i, k)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = math.max(0, g - w)
    i = 0
    while (i <= lastStart) {
      var m = gh(i)
      var j = i + 1
      val end = math.min(i + w, g)
      while (j < end) { if (gh(j) < m) m = gh(j); j += 1 }
      out.add(m)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sz = ctx.freshName("sz"); val g = ctx.freshName("g")
      val gh = ctx.freshName("gh"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val end = ctx.freshName("end")
      val last = ctx.freshName("last")
      val gad = classOf[GenericArrayData].getName
      val helper = "graft.functions.WinnowFp$.MODULE$"
      s"""
         |int $sz = $arr.numElements();
         |if ($sz < $k) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  int $g = $sz - $k + 1;
         |  long[] $gh = new long[$g];
         |  for (int $i = 0; $i < $g; $i++) {
         |    $gh[$i] = $helper.gramHash($arr, $i, $k);
         |  }
         |  java.util.LinkedHashSet<Long> $out =
         |    new java.util.LinkedHashSet<Long>();
         |  int $last = java.lang.Math.max(0, $g - $w);
         |  for (int $i = 0; $i <= $last; $i++) {
         |    long $m = $gh[$i];
         |    int $end = java.lang.Math.min($i + $w, $g);
         |    for (int $j = $i + 1; $j < $end; $j++) {
         |      if ($gh[$j] < $m) $m = $gh[$j];
         |    }
         |    $out.add($m);
         |  }
         |  ${ev.value} = new $gad($out.toArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)

  override def prettyName: String = "winnow_fp"
}

object WinnowFp {

  /** [[PolyHash]]'s fold over the space-joined gram
    * `tokens[start .. start+k)` WITHOUT building the string: member
    * tokens' UTF-8 bytes with one 0x20 between them. Null tokens are
    * skipped together with their separator — `UTF8String.concatWs`
    * semantics, which the replaced HOF chain inherits from
    * [[ShingleArray]]'s joiner.
    */
  def gramHash(arr: ArrayData, start: Int, k: Int): Long = {
    var acc = 0L
    var first = true
    var j = 0
    while (j < k) {
      if (!arr.isNullAt(start + j)) {
        if (!first) acc = (acc * 31L + 0x20L) % 1000000007L
        first = false
        val bytes = arr.getUTF8String(start + j).getBytes
        var b = 0
        while (b < bytes.length) {
          acc = (acc * 31L + (bytes(b) & 0xffL)) % 1000000007L
          b += 1
        }
      }
      j += 1
    }
    acc
  }

  def winnow_fp(tokens: Column, k: Int, w: Int): Column =
    GraftBridge.toColumn(WinnowFp(GraftBridge.toExpression(tokens), k, w))
}
