package graft.functions

import graft.operators.MarkdownKv
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the Markdown-KV parse/render boundary
  * (reference src/dativo_ingest/markdown_kv.py:101-366 semantics, same
  * pure core as [[graft.operators.MarkdownKv]]).
  *
  * The typed-Dataset formulation (`as[(String,String)].flatMap(...)`)
  * was the engine's only non-codegen surface: every parse paid a
  * DeserializeToObject/SerializeFromObject stage break plus case-class
  * and encoder allocations per output row. These expressions run the
  * same parser one static call per document INSIDE whole-stage codegen,
  * emitting InternalRows directly; `explode` (GenerateExec, codegen'd)
  * then flattens the per-document arrays.
  */

/** `array<struct<section,key,value,value_json,ord>>` per document —
  * kernel twin of `parseToRowPerKv` (doc_id/extracted_at compose as
  * plain columns outside).
  */
case class MdkvKvRows(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MdkvKvRows.Schema
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mdkv_kv_rows requires string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    MarkdownKv.kvRowsKernel(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val cls = "graft.operators.MarkdownKv$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.kvRowsKernel(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MdkvKvRows =
    copy(child = newChild)
}

object MdkvKvRows {
  val KvStruct: StructType = StructType(Seq(
    StructField("section", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("value_json", StringType, nullable = true),
    StructField("ord", LongType, nullable = false)))
  val Schema: DataType = ArrayType(KvStruct, containsNull = false)

  def apply(content: Column): Column =
    GraftExpressionBridge.column(
      MdkvKvRows(GraftExpressionBridge.expression(content)))
}

/** `struct<title, sections:array<struct<section,level,kv:array<...>>>>`
  * per document — kernel twin of `parseToDocumentLevel`; title is null
  * when the document provides none (caller coalesces with doc_id).
  */
case class MdkvDoc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MdkvDoc.Schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mdkv_doc requires string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    MarkdownKv.docKernel(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.MarkdownKv$$.MODULE$$.docKernel($c);")

  override protected def withNewChildInternal(newChild: Expression): MdkvDoc =
    copy(child = newChild)
}

object MdkvDoc {
  /** kv pairs nested per section: KvStruct minus the section column. */
  private val KvPairStruct: StructType =
    StructType(MdkvKvRows.KvStruct.fields.filter(_.name != "section"))

  val Schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("sections", ArrayType(StructType(Seq(
      StructField("section", StringType, nullable = false),
      StructField("level", IntegerType, nullable = false),
      StructField("kv", ArrayType(KvPairStruct, containsNull = false),
        nullable = false))), containsNull = false),
      nullable = false)))

  def apply(content: Column): Column =
    GraftExpressionBridge.column(
      MdkvDoc(GraftExpressionBridge.expression(content)))
}

/** record → `struct<doc_id, markdown_kv_content>` — kernel twin of
  * `toMarkdownKv`'s per-row render. Child is `struct(<all columns>)`;
  * field order = column order = rendered line order, doc_id resolved by
  * the same [[MarkdownKv.DocIdFields]] first-non-null chain.
  */
case class MdkvRender(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("markdown_kv_content", StringType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mdkv_render requires a struct, got ${other.catalogString}")
  }

  @transient private lazy val fields: Array[StructField] =
    child.dataType.asInstanceOf[StructType].fields

  // DocIdFields indexes present in this schema, in DocIdFields priority order
  @transient private lazy val idIdx: Array[Int] = {
    val names = fields.map(_.name)
    MarkdownKv.DocIdFields.iterator.map(n => names.indexOf(n)).filter(_ >= 0).toArray
  }

  /** Called once per row from generated code. */
  def renderRow(row: InternalRow): InternalRow = {
    val fs = fields
    val vals = new Array[Any](fs.length)
    var i = 0
    while (i < fs.length) {
      vals(i) = MarkdownKv.externalValue(fs(i).dataType, row.get(i, fs(i).dataType))
      i += 1
    }
    var docId = "unknown"
    var j = 0
    while (j < idIdx.length && (docId eq "unknown")) {
      val v = vals(idIdx(j))
      if (v != null) docId = v.toString
      j += 1
    }
    val content = MarkdownKv.renderRecord(
      fs.indices.map(i => fs(i).name -> vals(i)))
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(docId), UTF8String.fromString(content)))
  }

  override protected def nullSafeEval(row: Any): Any =
    renderRow(row.asInstanceOf[InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mdkvRender", this, classOf[MdkvRender].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.renderRow((org.apache.spark.sql.catalyst.InternalRow) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MdkvRender =
    copy(child = newChild)
}

object MdkvRender {
  def apply(allColumns: Column): Column =
    GraftExpressionBridge.column(
      MdkvRender(GraftExpressionBridge.expression(allColumns)))
}
