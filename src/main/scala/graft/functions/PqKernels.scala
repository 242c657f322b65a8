package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector is split into
  * `m` subspaces of `dsub` dims; each subspace is quantized to one of
  * `k` codebook centroids, so a D-dim float vector compresses to `m`
  * small codes (~m bytes at k ≤ 256 vs 4·D bytes — 64× at the 64-dim /
  * m=4 defaults). Asymmetric distance (ADC) between a FULL query and a
  * CODED corpus vector is exact-per-subspace: Σ_sub ‖q_sub − c_sub‖²,
  * which telescopes to ‖q − recon‖².
  *
  * Determinism contract (oracle-replayable): every per-subspace distance
  * accumulates sequentially in double over the dsub dims (the same fold
  * [[VecDot]] uses, replayed by DuckDB `list_reduce`), encode ties
  * resolve to the LOWER code, and ADC sums subspace entries in subspace
  * order — all three producers (encode, LUT, oracle SQL) see identical
  * bits.
  *
  * All three run one static call per row inside whole-stage codegen; the
  * flat codebook ships once per executor as a reference object.
  */
object PqKernels {

  /** ‖v[sub·dsub + ·] − codebook[sub][code][·]‖², sequential in double. */
  private def subDist(vec: ArrayData, isFloat: Boolean, flat: Array[Double],
      sub: Int, code: Int, k: Int, dsub: Int): Double = {
    val base = (sub * k + code) * dsub
    val off = sub * dsub
    var acc = 0.0
    var i = 0
    while (i < dsub) {
      val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
      val d = x - flat(base + i)
      acc += d * d
      i += 1
    }
    acc
  }

  private def anyNull(vec: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Encode: nearest centroid per subspace (strict <, ties → lower code).
    * Null when the vector is null, shorter than m·dsub, or has a null
    * element in the first m·dsub positions.
    */
  def codes(vec: ArrayData, isFloat: Boolean, flat: Array[Double],
      m: Int, k: Int, dsub: Int): ArrayData = {
    if (vec == null || vec.numElements() < m * dsub ||
      anyNull(vec, m * dsub)) return null
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var code = 0
      while (code < k) {
        val d = subDist(vec, isFloat, flat, sub, code, k, dsub)
        if (d < bestD) { bestD = d; best = code }
        code += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** Query-side distance lookup table: entry sub·k + code =
    * ‖q_sub − c[sub][code]‖². Computed ONCE per query row; ADC against
    * any coded vector is then m lookups. Same null contract as `codes`.
    */
  def lut(vec: ArrayData, isFloat: Boolean, flat: Array[Double],
      m: Int, k: Int, dsub: Int): ArrayData = {
    if (vec == null || vec.numElements() < m * dsub ||
      anyNull(vec, m * dsub)) return null
    val out = new Array[Any](m * k)
    var sub = 0
    while (sub < m) {
      var code = 0
      while (code < k) {
        out(sub * k + code) = subDist(vec, isFloat, flat, sub, code, k, dsub)
        code += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** ADC: Σ_sub lut[sub·k + codes[sub]], sequential in subspace order.
    * Null if either side is null or a code is out of the table's range.
    */
  def adc(lutArr: ArrayData, codesArr: ArrayData, k: Int): java.lang.Double = {
    if (lutArr == null || codesArr == null) return null
    val m = codesArr.numElements()
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      if (codesArr.isNullAt(sub)) return null
      val idx = sub * k + codesArr.getInt(sub)
      if (idx < 0 || idx >= lutArr.numElements() || lutArr.isNullAt(idx)) return null
      acc += lutArr.getDouble(idx)
      sub += 1
    }
    acc
  }
}

sealed abstract class PqVecExpression extends UnaryExpression {
  def flat: Array[Double]
  def m: Int
  def k: Int
  def dsub: Int
  def kernelName: String // "codes" | "lut"

  override def nullable: Boolean = true

  // NOT a constructor require: Java deserialization on executors invokes
  // the constructor chain before fields are populated, so a body-level
  // require NPEs the task. Analysis-time validation catches it instead.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (flat.length == m * k * dsub) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pq_$kernelName codebook must have m*k*dsub = ${m * k * dsub} " +
          s"entries: ${flat.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_$kernelName requires array<float|double>, got ${other.catalogString}")
  }

  protected def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    val cls = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $cls.$kernelName(${childGen.isNull} ? null : ${childGen.value},
          $childIsFloat, $flatRef, $m, $k, $dsub);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }
}

/** vec → array<int> of `m` PQ codes. */
case class PqCodes(child: Expression, flat: Array[Double],
    m: Int, k: Int, dsub: Int) extends PqVecExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def kernelName: String = "codes"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    PqKernels.codes(child.eval(input).asInstanceOf[ArrayData], childIsFloat,
      flat, m, k, dsub)
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def apply(vec: Column, flat: Array[Double], m: Int, k: Int, dsub: Int): Column =
    GraftExpressionBridge.column(
      PqCodes(GraftExpressionBridge.expression(vec), flat, m, k, dsub))
}

/** query vec → array<double> distance LUT of m·k entries. */
case class PqLut(child: Expression, flat: Array[Double],
    m: Int, k: Int, dsub: Int) extends PqVecExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def kernelName: String = "lut"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    PqKernels.lut(child.eval(input).asInstanceOf[ArrayData], childIsFloat,
      flat, m, k, dsub)
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  def apply(vec: Column, flat: Array[Double], m: Int, k: Int, dsub: Int): Column =
    GraftExpressionBridge.column(
      PqLut(GraftExpressionBridge.expression(vec), flat, m, k, dsub))
}

/** (lut, codes) → ADC distance (double): m array lookups per pair. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<double>, array<int>), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqKernels.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val cls = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("adc")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      java.lang.Double $boxed = $cls.adc(
        ${leftGen.isNull} ? null : ${leftGen.value},
        ${rightGen.isNull} ? null : ${rightGen.value}, $k);
      boolean ${ev.isNull} = $boxed == null;
      double ${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(lut: Column, codes: Column, k: Int): Column =
    GraftExpressionBridge.column(PqAdc(
      GraftExpressionBridge.expression(lut),
      GraftExpressionBridge.expression(codes), k))
}
