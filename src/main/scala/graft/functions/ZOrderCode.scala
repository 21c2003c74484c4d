package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) code: interleave the low `bitsPer` bits of two
  * non-negative integer dimensions into one long — bit i of `left` lands at
  * position 2i, bit i of `right` at 2i+1. Sorting by the code gives
  * multi-dimensional locality: rows close in BOTH dimensions are close in
  * the one-dimensional order, so parquet row-group min/max statistics prune
  * range predicates on EITHER dimension (the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). Codegen'd single pass; negative
  * inputs are rejected at runtime (callers normalize first — hash or
  * offset) rather than silently interleaving sign bits. Values at or
  * above `2^bitsPer` are CLAMPED to `2^bitsPer - 1` (saturation) before
  * interleaving: dropping the high bits instead would alias distant
  * points into the same z-code and silently destroy the written files'
  * min/max pruning power; saturation is monotone, so out-of-range values
  * collapse onto the top edge of the grid and tile statistics stay
  * truthful.
  */
case class ZOrderCode(left: Expression, right: Expression, bitsPer: Int)
    extends BinaryExpression {

  require(bitsPer >= 1 && bitsPer <= 31,
    s"zorder_code bitsPer must be in [1, 31], got $bitsPer")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_code requires integral inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  private def toLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val max = (1L << bitsPer) - 1
    val x = math.min(toLong(a), max); val y = math.min(toLong(b), max)
    if (x < 0 || y < 0) {
      throw new IllegalArgumentException(
        s"zorder_code inputs must be non-negative, got ($x, $y)")
    }
    var z = 0L
    var i = 0
    while (i < bitsPer) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val z = ctx.freshName("z"); val i = ctx.freshName("i")
      s"""
         |long $x = Math.min((long) $a, ${(1L << bitsPer) - 1}L);
         |long $y = Math.min((long) $b, ${(1L << bitsPer) - 1}L);
         |if ($x < 0L || $y < 0L) {
         |  throw new IllegalArgumentException(
         |    "zorder_code inputs must be non-negative, got (" + $x + ", " + $y + ")");
         |}
         |long $z = 0L;
         |for (int $i = 0; $i < $bitsPer; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder_code"
}

object ZOrderCode {
  def zorder_code(a: Column, b: Column, bitsPer: Int = 16): Column =
    GraftBridge.toColumn(ZOrderCode(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b), bitsPer))
}
