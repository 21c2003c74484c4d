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

  def zorder_code_n(cols: Seq[Column], bitsPer: Int): Column =
    GraftBridge.toColumn(ZOrderCodeN(
      cols.map(GraftBridge.toExpression), bitsPer))
}

/** N-dimensional Morton code — [[ZOrderCode]] generalized to any arity
  * (Delta/Iceberg `OPTIMIZE ZORDER BY` takes n columns): bit `i` of
  * dimension `j` lands at position `i·n + j`, so for n = 2 the code is
  * BIT-IDENTICAL to [[ZOrderCode]] (left = dimension 0 at even
  * positions). Same saturation-not-truncation clamp per dimension,
  * same non-negative contract, one codegen'd double loop regardless of
  * arity (the [[PqEncode]] lesson: n inlined per-dimension trees would
  * bloat the fused method; a loop over a references array cannot).
  * `n · bitsPer` must fit a positive long (≤ 63 bits).
  *
  * CodegenFallback, deliberately: the n-ary form is evaluated once per
  * row per OPTIMIZE rewrite — a pass whose cost is the range shuffle
  * and parquet I/O, not the key computation — and never sits in a
  * probe/scan hot path (probes read the LAYOUT the key produced, not
  * the key). The 2-dim [[ZOrderCode]] keeps its generated form for the
  * gated expression surface.
  */
case class ZOrderCodeN(children: Seq[Expression], bitsPer: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(children.size >= 2, s"zorder_code_n needs >= 2 dims, got ${children.size}")
  require(bitsPer >= 1 && children.size * bitsPer <= 63,
    s"zorder_code_n needs n*bitsPer <= 63, got ${children.size} * $bitsPer")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (bad.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_code_n requires integral inputs, got " +
          bad.map(_.catalogString).mkString(", "))
  }

  private def toLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val max = (1L << bitsPer) - 1
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = math.min(toLong(v), max)
      if (x < 0) throw new IllegalArgumentException(
        s"zorder_code_n inputs must be non-negative, got $x in dim $j")
      var i = 0
      while (i < bitsPer) {
        z |= ((x >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCodeN =
    copy(children = newChildren)

  override def prettyName: String = "zorder_code_n"
}
