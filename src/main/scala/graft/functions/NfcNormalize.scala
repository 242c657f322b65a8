package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — Spark
  * SQL has no normalization function, and crawl text mixes composed and
  * decomposed forms of the same grapheme (e.g. U+00E9 vs e+U+0301), so
  * exact dedup fingerprints and shingles disagree on visually-identical
  * documents unless the text is normalized first. `java.text.Normalizer`
  * NFC matches DuckDB's `nfc_normalize` (both implement UAX #15), which
  * keeps the oracle replayable byte-for-byte.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (ASCII and most
  * already-composed text short-circuits) and avoids allocating for the
  * overwhelmingly-common already-NFC row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.nfc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Column-API entry point. */
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      NfcNormalize(GraftExpressionBridge.expression(text)))

  /** Row kernel — called once per row from generated code. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
