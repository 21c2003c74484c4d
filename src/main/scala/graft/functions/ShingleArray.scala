package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in one codegen'd pass:
  * every run of `n` consecutive tokens joined with a single space,
  * first-occurrence order, duplicates dropped.
  *
  * Replaces `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i + 1, n))))` — four nested higher-order functions that
  * Spark always evaluates interpreted (no `doGenCode` on lambda functions),
  * splitting the surrounding stage out of whole-stage codegen. Measured on
  * the documents table, the interpreted HOF chain dominated every
  * shingle-based dedup plan; this expression keeps the scan → shingle →
  * explode pipeline inside one codegen stage. Tokens shorter than `n` yield
  * an empty array (total — safe under optimizer rules that copy generator
  * expressions into filters).
  */
case class ShingleArray(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_array requires ARRAY<STRING> input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet dedupes in first-occurrence order; the multiplicity
    // form (distinct = false) keeps every occurrence — language-model
    // counts need them
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](sz - n + 1)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        // null tokens stay null: concatWs SKIPS null inputs, matching the
        // concat_ws(" ", slice(...)) chain this expression replaces
        buf(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(ShingleArray.Space, buf: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sz = ctx.freshName("sz")
      val seen = ctx.freshName("seen")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val space = s"graft.functions.ShingleArray$$.MODULE$$.Space()"
      // `distinct` is a plan-time constant: pick the container at codegen
      val container =
        if (distinct) s"java.util.LinkedHashSet<$utf8>"
        else s"java.util.ArrayList<$utf8>"
      s"""
         |int $sz = $arr.numElements();
         |if ($sz < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  $container $seen = new $container();
         |  $utf8[] $buf = new $utf8[$n];
         |  for (int $i = 0; $i <= $sz - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $buf[$j] = $arr.isNullAt($i + $j)
         |        ? null : $arr.getUTF8String($i + $j);
         |    }
         |    $seen.add($utf8.concatWs($space, $buf));
         |  }
         |  ${ev.value} = new $gad($seen.toArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)

  override def prettyName: String = "shingle_array"
}

object ShingleArray {
  val Space: UTF8String = UTF8String.fromString(" ")

  /** Column API: `shingle_array(tokensCol, 3)`. */
  def shingle_array(tokens: Column, n: Int): Column =
    GraftBridge.toColumn(ShingleArray(GraftBridge.toExpression(tokens), n))

  /** Multiplicity-keeping variant: every n-gram occurrence, in order —
    * the form language-model count pipelines need.
    */
  def shingle_array_all(tokens: Column, n: Int): Column =
    GraftBridge.toColumn(
      ShingleArray(GraftBridge.toExpression(tokens), n, distinct = false))
}
