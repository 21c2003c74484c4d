package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature in one codegen'd pass: for each of `numHashes` seeded
  * xxhash64 functions, the minimum over the input string array — the
  * permutation-min sketch whose per-position agreement rate estimates
  * Jaccard similarity.
  *
  * Replaces an explode → groupBy(doc) → 32×min aggregation, which shuffles
  * every (doc, shingle) row; the signature is per-row narrow compute, so at
  * 100 TB this runs at scan speed with zero exchanges. Empty arrays yield
  * Long.MaxValue minima (no match with anything).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires ARRAY<STRING> input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUTF8String(s, k.toLong)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String s = $arr.getUTF8String($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $h = $xxh.hashUTF8String(s, (long) $k);
         |      if ($h < $mins[$k]) $mins[$k] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Column API: `minhash_sig(shinglesCol, 32)`. */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpression(shingles), numHashes))
}
