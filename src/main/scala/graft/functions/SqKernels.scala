package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 8-bit scalar-quantization (SQ8) kernels — the FAISS
  * `ScalarQuantizer(QT_8bit)` shape: each dimension is linearly mapped
  * onto [0, 255] by per-dim (min, max) trained in one aggregate pass, so
  * a D-dim float vector compresses to D bytes (4× vs float32, 8× vs the
  * double math) while keeping per-dim resolution of (max−min)/255 —
  * orders of magnitude finer than PQ at small m, at the cost of no
  * sublinear candidate pruning on its own.
  *
  * Asymmetric distance (the SQ analog of ADC) keeps the FULL-precision
  * query and decodes each corpus byte on the fly at the BIN CENTER:
  * Σ_i (q_i − (min_i + (code_i + 0.5)·step_i))² with
  * step_i = (max_i−min_i)/255 — the FAISS QT_8bit reconstruction, which
  * halves the worst-case per-dim decode bias vs the bin's lower edge
  * (a floor-encoded value lies anywhere in [edge, edge + step); the
  * center is the minimax reconstruction point).
  * The decode is two flops per dim per pair — cheaper than materializing
  * a reconstructed double[] per corpus row (8× the memory traffic of the
  * byte codes, which is the whole point of the compression).
  *
  * Determinism contract (oracle-replayable): codes are
  * `floor((x − min_i) · (255/(max_i − min_i)))` clamped to [0, 255]
  * (degenerate max == min dims encode 0 and decode to min_i exactly —
  * step is 0 there, so the +0.5 is inert), the scale and step divisions
  * each happen exactly once so DuckDB replays the same IEEE bits, the
  * decode is one add then one multiply then one add
  * (`min + (code + 0.5)·step`, replayed in that order), and the
  * distance accumulates sequentially in double over dims — the same
  * fold [[VecDot]]/[[PqKernels]] use.
  *
  * Null contract (mirrors [[PqKernels]]): a null vector, a vector
  * shorter than dim, or a null element in the first dim positions
  * encodes/scores to null; callers filter null distances so they cannot
  * rank first.
  */
object SqKernels {

  private def anyNull(vec: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Encode to one unsigned byte per dim: floor((x − min)·scale), clamped. */
  def codes(vec: ArrayData, isFloat: Boolean, mins: Array[Double],
      scales: Array[Double]): Array[Byte] = {
    val dim = mins.length
    if (vec == null || vec.numElements() < dim || anyNull(vec, dim)) return null
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val c = math.floor((x - mins(i)) * scales(i))
      out(i) = (if (c < 0) 0 else if (c > 255) 255 else c.toInt).toByte
      i += 1
    }
    out
  }

  /** Asymmetric L2²: full-precision query vs corpus bytes decoded at
    * bin centers, sequential in double over dims.
    */
  def dist(q: ArrayData, isFloat: Boolean, codes: Array[Byte],
      mins: Array[Double], steps: Array[Double]): java.lang.Double = {
    val dim = mins.length
    if (q == null || codes == null || q.numElements() < dim ||
      codes.length < dim || anyNull(q, dim)) return null
    var acc = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val d = x - (mins(i) + ((codes(i) & 0xFF).toDouble + 0.5) * steps(i))
      acc += d * d
      i += 1
    }
    acc
  }
}

/** vec → binary of `mins.length` SQ8 code bytes. */
case class SqCodes(child: Expression, mins: Array[Double],
    scales: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  // analysis-time, not constructor require — see PqVecExpression
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (mins.nonEmpty && mins.length == scales.length)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sq_codes params must be non-empty and same length: " +
          s"${mins.length} mins, ${scales.length} scales")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_codes requires array<float|double>, got ${other.catalogString}")
  }

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqKernels.codes(child.eval(input).asInstanceOf[ArrayData], childIsFloat,
      mins, scales)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val minsRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sqScales", scales, "double[]")
    val cls = SqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      byte[] ${ev.value} = $cls.codes(
        ${childGen.isNull} ? null : ${childGen.value},
        $childIsFloat, $minsRef, $scalesRef);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SqCodes =
    copy(child = newChild)
}

object SqCodes {
  def apply(vec: Column, mins: Array[Double], scales: Array[Double]): Column =
    GraftExpressionBridge.column(
      SqCodes(GraftExpressionBridge.expression(vec), mins, scales))
}

/** (query vec, code bytes) → asymmetric L2² distance (double). */
case class SqDist(left: Expression, right: Expression,
    mins: Array[Double], steps: Array[Double]) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), BinaryType) =>
        if (mins.nonEmpty && mins.length == steps.length)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"sq_dist params must be non-empty and same length: " +
            s"${mins.length} mins, ${steps.length} steps")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist requires (array<float|double>, binary), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    SqKernels.dist(l.asInstanceOf[ArrayData], leftIsFloat,
      r.asInstanceOf[Array[Byte]], mins, steps)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val minsRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val stepsRef = ctx.addReferenceObj("sqSteps", steps, "double[]")
    val cls = SqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("sqd")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      java.lang.Double $boxed = $cls.dist(
        ${leftGen.isNull} ? null : ${leftGen.value}, $leftIsFloat,
        ${rightGen.isNull} ? null : ${rightGen.value}, $minsRef, $stepsRef);
      boolean ${ev.isNull} = $boxed == null;
      double ${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  def apply(qv: Column, codes: Column, mins: Array[Double],
      steps: Array[Double]): Column =
    GraftExpressionBridge.column(SqDist(
      GraftExpressionBridge.expression(qv),
      GraftExpressionBridge.expression(codes), mins, steps))
}
