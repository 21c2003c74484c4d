package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint: fold over UTF-8 bytes of the
  * input, `acc = (acc * 31 + byte) mod 1e9+7`.
  *
  * A native Catalyst `Expression` with `doGenCode` so it stays inside
  * whole-stage codegen (no UDF serialization, no boxing) — this is the
  * preferred shape for custom scalar functions at 100 TB (see builder
  * guidance; the reference needs no custom scalars, SURVEY §2.5 — this is
  * extension surface for the text pipeline).
  *
  * The modulus keeps the accumulator < 2^30 so `acc * 31 + b` never
  * overflows a signed 64-bit long — the same fold is therefore expressible
  * in engines that trap on BIGINT overflow (DuckDB), which makes the
  * fingerprint oracle-checkable.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "polyhash"
}

object PolyHash {
  import org.apache.spark.sql.GraftBridge
  /** Column API: `poly_hash($"text")`. */
  def poly_hash(c: Column): Column =
    GraftBridge.toColumn(PolyHash(GraftBridge.toExpression(c)))
}
