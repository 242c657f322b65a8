package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string as a native codegen'd
  * expression — the compression-ratio quality signal (raw bytes ÷
  * deflated bytes) used by pretraining pipelines to catch repetitive
  * machine-generated boilerplate that token-level repetition rules miss
  * (the Gopher/MassiveText recipe family): natural prose deflates to
  * ~2–3×, templated spam to 10×+.
  *
  * Fixed level 6 and zlib wrapping pin the output length for a given
  * zlib build; the signal is a HEURISTIC consumed via thresholds, so
  * last-bit stability across zlib versions is not load-bearing. The
  * correctness gate replays the same config through Python's zlib
  * (`zlib_deflate_len` UDF in tools/check_correctness.py) and
  * hash-compares whole rows — verified to agree row-for-row on the
  * test corpus; a Deflater-level or strategy drift here now FAILS the
  * gate instead of passing a rows-only check.
  *
  * Per-row cost is O(bytes) with a thread-local Deflater (Deflater
  * allocation is expensive native state; reset() is cheap) — map-side,
  * scan-speed, no shuffle.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    DeflateLen.len(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DeflateLen.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.len($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** Column-API entry point. */
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      DeflateLen(GraftExpressionBridge.expression(text)))

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  /** Row kernel — called once per row from generated code. */
  def len(text: UTF8String): Long = {
    val d = local.get()
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
