package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array: each token is hashed to 64 bits, each
  * hash votes ±1 per bit position, the result sets bits with positive vote
  * sums. Near-duplicate documents land within a small hamming distance.
  *
  * Two token-hash modes:
  *   - `portable = false` (default): xxhash64 seed 42, same as Spark's
  *     `xxhash64` — the fast production path.
  *   - `portable = true`: the low 64 bits of MD5 (digest bytes 8..15 read
  *     little-endian), bit-identical to DuckDB's `md5_number_lower` — the
  *     oracle-checkable path; same algorithm, slower per-token hash.
  *
  * One codegen'd pass over the tokens per row — replaces a 64-way
  * `aggregate()` higher-order-function tree that was ~15× slower (the
  * declarative form builds 64 independent folds over the same array).
  * Null tokens are skipped; a null array yields null.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires ARRAY<STRING> input, got ${t.catalogString}")
    }

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h =
          if (portable) SimHash64.md5Low64(md5, s.getBytes)
          else XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.addMutableState("int[]", "simhashVotes",
        v => s"$v = new int[64];")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      val tokenHash = if (portable) {
        val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd5",
          v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                  |catch (java.security.NoSuchAlgorithmException e) {
                  |  throw new RuntimeException(e);
                  |}""".stripMargin)
        val dig = ctx.freshName("dig"); val k = ctx.freshName("k")
        s"""byte[] $dig = $md.digest($arr.getUTF8String($i).getBytes());
           |long $h = 0L;
           |for (int $k = 0; $k < 8; $k++) {
           |  $h |= ((long) $dig[8 + $k] & 0xffL) << (8 * $k);
           |}""".stripMargin
      } else {
        val xxh = classOf[XXH64].getName
        s"long $h = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);"
      }
      s"""
         |java.util.Arrays.fill($votes, 0);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $tokenHash
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Column API: `simhash64(tokensCol)` over an array<string> column. */
  def simhash64(tokens: Column, portable: Boolean = false): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens), portable))

  /** Low 64 bits of MD5: digest bytes 8..15 read little-endian — matches
    * DuckDB `md5_number_lower` (verified empirically against hashlib).
    */
  def md5Low64(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var out = 0L
    var i = 0
    while (i < 8) {
      out |= (d(8 + i).toLong & 0xffL) << (8 * i)
      i += 1
    }
    out
  }
}
