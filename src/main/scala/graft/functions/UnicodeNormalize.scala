package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a Catalyst expression — the text-pipeline
  * step every web-scale corpus runs before tokenization/dedup (C4,
  * CCNet, RefinedWeb all NFC/NFKC-normalize): canonically equivalent
  * byte sequences (composed `é` U+00E9 vs decomposed `e`+U+0301) must
  * hash, shingle, and compare EQUAL, or every downstream dedup/count
  * operator silently treats equal text as distinct. Spark has no
  * built-in for this; the expression wraps `java.text.Normalizer`
  * (the JDK's ICU-derived implementation) behind codegen, so it rides
  * whole-stage codegen like the rest of the text family — narrow
  * per-row projection, zero shuffle, scan speed at 100 TB.
  *
  * Forms: NFC (canonical compose — the default, what the gate proves
  * cross-engine against DuckDB's `nfc_normalize`), NFD, NFKC, NFKD
  * (compatibility forms fold ligatures/width — the aggressive cleanup
  * some pipelines want; spec-covered, no DuckDB counterpart to gate).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("/")}: $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize requires STRING input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.UnicodeNormalize$.MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = $helper.normalize($s, "$form");""")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    // quick reject: Normalizer.isNormalized is a cheap scan and the
    // overwhelmingly common web-text case (pure ASCII and already-NFC
    // text) skips the allocation entirely
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    GraftBridge.toColumn(
      UnicodeNormalize(GraftBridge.toExpression(text), form))
}
