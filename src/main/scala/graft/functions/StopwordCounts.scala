package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-list stopword counts over whitespace tokens as ONE native
  * codegen'd expression: tokenize `lower(trim(text))` once, return
  * `array<bigint>` with the membership count of each word list.
  *
  * Drop-in equivalent of N independent
  * `size(filter(split(lower(trim(text)), "\\s+"), t => t.isin(words…)))`
  * columns — same tokens (UTF8String trim/toLowerCase, Java regex split),
  * same counts, same null contract (null text → null) — but the HOF shape
  * is interpreted per token (a boxed lambda dispatch plus a linear
  * `isin` scan of the word list per token, per list), and language ID
  * ran it five times per row. This runs one static call per row inside
  * whole-stage codegen with a shared tokenization and hash-set lookups.
  */
case class StopwordCounts(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // one set per list, built once per executor (the case-class field is
  // the serialized form; the sets are derived state)
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lists.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    StopwordCounts.count(input.asInstanceOf[UTF8String], sets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("stopwordSets", sets,
      "java.util.HashSet[]")
    val cls = StopwordCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.count($c, $setsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCounts =
    copy(child = newChild)
}

object StopwordCounts {

  /** Column-API entry point. */
  def apply(text: Column, lists: Seq[Seq[String]]): Column =
    GraftExpressionBridge.column(
      StopwordCounts(GraftExpressionBridge.expression(text), lists))

  /** Row kernel — called once per row from generated code. */
  def count(text: UTF8String,
      sets: Array[java.util.HashSet[String]]): ArrayData = {
    // UTF8String.trim/toLowerCase are exactly what Spark's trim()/lower()
    // expressions call, so tokens match the Column formulation bit-for-bit
    val toks = text.trim().toLowerCase.toString.split("\\s+")
    val out = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(t)) out(j) += 1L
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
