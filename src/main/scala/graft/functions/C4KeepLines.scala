package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C4 line-level quality filtering (Raffel et al. 2020 §2.2) as one
  * native codegen'd pass: split the document on newlines, space-trim
  * each line, keep a line iff it
  *   - is non-empty,
  *   - ends in terminal punctuation (`.` `!` `?` `"` — the C4 rule),
  *   - has at least `minWords` whitespace-delimited words,
  *   - does not mention `javascript` (case-insensitive),
  * and return the kept lines joined by `\n` (empty string when nothing
  * survives). Document-level C4 rules (minimum surviving lines, "lorem
  * ipsum", curly brace) stay in plain Column land —
  * [[graft.operators.TextAnalysis.c4LineFilter]] composes them.
  *
  * Kernel semantics are pinned to what DuckDB replays exactly:
  * space-only trim (SQL `trim`), `\s+` word splitting (leading
  * tab yields a leading empty token in BOTH engines), ASCII terminal
  * check, lowercase containment. One static call per row inside
  * whole-stage codegen — map-side, shuffle-free, scan-speed at 100 TB.
  */
case class C4KeepLines(child: Expression, minWords: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    C4KeepLines.keep(input.asInstanceOf[UTF8String], minWords)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = C4KeepLines.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.keep($c, $minWords);")
  }

  override protected def withNewChildInternal(newChild: Expression): C4KeepLines =
    copy(child = newChild)
}

object C4KeepLines {

  /** Column-API entry point. */
  def apply(text: Column, minWords: Int): Column =
    GraftExpressionBridge.column(
      C4KeepLines(GraftExpressionBridge.expression(text), minWords))

  /** SQL-`trim` twin: strip 0x20 spaces only (Java's `String.trim`
    * also strips tabs/controls and would diverge from the oracle).
    */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def isTerminal(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '"'

  /** Row kernel — called once per row from generated code. */
  def keep(text: UTF8String, minWords: Int): UTF8String = {
    val lines = text.toString.split("\n", -1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < lines.length) {
      val t = trimSpaces(lines(i))
      if (t.nonEmpty && isTerminal(t.charAt(t.length - 1)) &&
          t.split("\\s+").length >= minWords &&
          !t.toLowerCase(java.util.Locale.ROOT).contains("javascript")) {
        if (sb.length > 0) sb.append('\n')
        sb.append(t)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
