package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of lowercased text as a native
  * expression.
  *
  * Drop-in equivalent of the Column formulation
  * `when(size(t) >= n, array_distinct(transform(sequence(0, size(t)-n),
  * i => array_join(slice(t, i+1, n), " ")))).otherwise(array())` with
  * `t = split(lower(trim(text)), "\\s+")` — same tokens (UTF8String
  * trim/toLowerCase, Java regex split), same first-occurrence distinct
  * order, same null contract (null text → EMPTY array, because the HOF's
  * `when` falls through to `otherwise` on null). The HOF version is
  * interpreted per shingle (a boxed lambda dispatch per slice, plus an
  * O(k²) array_distinct); this runs one static call per row inside
  * whole-stage codegen and was the dominant cost of every shingling
  * pipeline at bench scale.
  */
case class TextShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextShingles.shingles(child.eval(input).asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TextShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.shingles(${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TextShingles =
    copy(child = newChild)
}

/** ALL word n-grams of lowercased text WITH multiplicity, in document
  * order — the repetition-counting twin of [[TextShingles]] (whose
  * first-occurrence distinct is right for Jaccard/minhash set
  * semantics but destroys exactly the duplicate counts Gopher's
  * n-gram rules measure). Same tokenizer, same null/short-doc → empty
  * contract; one static call per row in whole-stage codegen, no token
  * explode, no window sort.
  */
case class TextShinglesAll(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextShingles.allShingles(child.eval(input).asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TextShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.allShingles(${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TextShinglesAll =
    copy(child = newChild)
}

object TextShinglesAll {
  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    GraftExpressionBridge.column(
      TextShinglesAll(GraftExpressionBridge.expression(text), n))
}

object TextShingles {

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    GraftExpressionBridge.column(
      TextShingles(GraftExpressionBridge.expression(text), n))

  private val Empty = new GenericArrayData(Array.empty[Any])

  private def tokensOf(text: UTF8String): Array[String] =
    // UTF8String.trim/toLowerCase are exactly what Spark's trim()/lower()
    // expressions call, so tokens match the Column formulation bit-for-bit
    text.trim().toLowerCase.toString.split("\\s+")

  private def gram(toks: Array[String], i: Int, n: Int,
      sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    sb.toString
  }

  /** Row kernel — called once per row from generated code. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return Empty
    val toks = tokensOf(text)
    if (toks.length < n) return Empty
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      seen.add(gram(toks, i, n, sb))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** [[TextShinglesAll]] row kernel: every n-gram, duplicates kept.
    *
    * `split("\\s+")` yields a leading EMPTY token when the text starts
    * with non-space whitespace (tab/newline — `UTF8String.trim` strips
    * only 0x20); that token is skipped here so grams like `" word"`
    * never enter the repetition counts (the DuckDB oracle's
    * `WHERE w <> ''` and the word-level repetition tokenizer both
    * already exclude it — this keeps engine and oracle agreeing on
    * leading-whitespace documents). [[shingles]] above deliberately
    * keeps its historical token stream untouched: its dedup oracles
    * replay that exact convention on both sides, so the contract is
    * consistent there and changing it would churn every minhash store.
    */
  def allShingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return Empty
    val toks = tokensOf(text)
    val off = if (toks.length > 0 && toks(0).isEmpty) 1 else 0
    val m = toks.length - off
    if (m < n) return Empty
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      out(i) = UTF8String.fromString(gram(toks, off + i, n, sb))
      i += 1
    }
    new GenericArrayData(out)
  }
}
