package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All hyperplane sign bits of a vector in ONE kernel call: dot the
  * vector against every sign row of `signs` (sequential double folds,
  * bit-identical to [[VecDot]] against the same literals) and pack each
  * consecutive `planesPerKey` signs into a long — the per-table LSH
  * bucket patterns.
  *
  * Drop-in equivalent of the per-plane Column formulation
  * `when(VecDot(slice(v, 1, dim), lit(signs_j)) > 0, 1L << p)
  * .otherwise(0L)` OR-reduced per table — same bits, same degenerate
  * contract (null vector, vector shorter than `dim`, or a null element
  * in the first `dim` positions → every dot is null, every `when` falls
  * through, every pattern is 0) — but the multi-table near-dup path
  * evaluated 64 separate VecDot expression nodes per row, each
  * re-unwrapping the array; this reads the vector once and runs one
  * tight planes×dim loop inside whole-stage codegen.
  */
case class HyperplaneBits(child: Expression, signs: Seq[Array[Double]],
    planesPerKey: Int) extends UnaryExpression {

  require(signs.nonEmpty && signs.length % planesPerKey == 0,
    s"signs (${signs.length}) must be a multiple of planesPerKey ($planesPerKey)")
  require(signs.map(_.length).distinct.size == 1,
    "every sign vector must have the same dimension")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bits requires array<float|double>, got ${other.catalogString}")
  }

  private def dim: Int = signs.head.length

  // flat row-major copy shipped once per executor
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](signs.length * dim)
    var j = 0
    while (j < signs.length) {
      System.arraycopy(signs(j), 0, f, j * dim, dim)
      j += 1
    }
    f
  }

  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HyperplaneBits.buckets(child.eval(input).asInstanceOf[ArrayData],
      childIsFloat, flat, signs.length, dim, planesPerKey)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("hyperplaneSigns", flat, "double[]")
    val cls = HyperplaneBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.buckets(${childGen.isNull} ? null : ${childGen.value},
            $childIsFloat, $flatRef, ${signs.length}, $dim, $planesPerKey);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

object HyperplaneBits {

  /** Column-API entry point. */
  def apply(vec: Column, signs: Seq[Array[Double]], planesPerKey: Int): Column =
    GraftExpressionBridge.column(HyperplaneBits(
      GraftExpressionBridge.expression(vec), signs, planesPerKey))

  /** Row kernel — called once per row from generated code. */
  def buckets(v: ArrayData, isFloat: Boolean, flat: Array[Double],
      nPlanes: Int, dim: Int, perKey: Int): ArrayData = {
    val keys = new Array[Long](nPlanes / perKey)
    if (v == null || v.numElements() < dim)
      return new GenericArrayData(keys) // degenerate → all-zero patterns
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return new GenericArrayData(keys)
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var j = 0
    while (j < nPlanes) {
      var d = 0.0
      var k = 0
      val off = j * dim
      while (k < dim) { d += x(k) * flat(off + k); k += 1 }
      if (d > 0) keys(j / perKey) |= 1L << (j % perKey)
      j += 1
    }
    new GenericArrayData(keys)
  }
}
