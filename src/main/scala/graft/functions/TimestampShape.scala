package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First-matching timestamp-shape index of a string — the dispatch half
  * of [[graft.operators.Coercion.toTimestampCol]]'s guarded format
  * chain, as one character scan instead of up to 8 `rlike` evaluations
  * per value.
  *
  * Shapes are the exact [[graft.core.Coercion.TimestampFormatGuards]]
  * regexes (aligned by index with `TimestampFormats`), evaluated in the
  * same first-match order the coalesce chain used; −1 means no shape
  * matches. Parity note: Java regex `$` also matches before one
  * trailing `\n`; a newline-suffixed string used to pass its guard and
  * then FAIL the parse (→ null through every arm), so rejecting it here
  * (−1 → null directly) is result-identical and spec-pinned.
  */
case class TimestampShape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"timestamp_shape requires string, got ${other.catalogString}")
  }

  protected override def nullSafeEval(s: Any): Any =
    TimestampShape.shapeIndex(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TimestampShape.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.shapeIndex($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TimestampShape =
    copy(child = newChild)
}

object TimestampShape {

  def apply(c: Column): Column =
    GraftExpressionBridge.column(
      TimestampShape(GraftExpressionBridge.expression(c)))

  private def digits(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** `\d{4}-\d{2}-\d{2}` at position 0 (s must have ≥ 10 chars). */
  private def datePart(s: String): Boolean =
    digits(s, 0, 4) && s.charAt(4) == '-' && digits(s, 5, 7) &&
      s.charAt(7) == '-' && digits(s, 8, 10)

  /** date + `sep` + `\d{2}:\d{2}:\d{2}` (s must have ≥ 19 chars). */
  private def dateTime(s: String, sep: Char): Boolean =
    datePart(s) && s.charAt(10) == sep &&
      digits(s, 11, 13) && s.charAt(13) == ':' && digits(s, 14, 16) &&
      s.charAt(16) == ':' && digits(s, 17, 19)

  /** ±\d{2}:\d{2} at position p (s must have ≥ p+6 chars). */
  private def colonOffset(s: String, p: Int): Boolean = {
    val c = s.charAt(p)
    (c == '+' || c == '-') && digits(s, p + 1, p + 3) &&
      s.charAt(p + 3) == ':' && digits(s, p + 4, p + 6)
  }

  /** Row kernel — first matching guard index, −1 when none. */
  def shapeIndex(u: UTF8String): Int = {
    val s = u.toString
    val n = s.length
    // guard 5 is the only shape shorter than 19
    if (n == 10) return if (datePart(s)) 5 else -1
    if (n < 19) return -1
    if (n == 19) {
      if (dateTime(s, 'T')) return 0 // guard 0
      return if (dateTime(s, ' ')) 4 else -1 // guard 4
    }
    if (!dateTime(s, 'T')) return -1
    val tail = s.charAt(19)
    // guard 1: .<1-6 digits> to end
    if (tail == '.' && n >= 21 && n <= 26 && digits(s, 20, n)) return 1
    // guard 2: Z (guard 6's Z alternative is shadowed, same as coalesce)
    if (n == 20 && tail == 'Z') return 2
    // guard 3: .<1-6 digits>Z
    if (tail == '.' && n >= 22 && n <= 27 && s.charAt(n - 1) == 'Z' &&
      digits(s, 20, n - 1)) return 3
    // guard 6: ±HH:MM
    if (n == 25 && colonOffset(s, 19)) return 6
    // guard 7: ±HHMM
    if (n == 24 && (tail == '+' || tail == '-') && digits(s, 20, 24)) return 7
    -1
  }
}
