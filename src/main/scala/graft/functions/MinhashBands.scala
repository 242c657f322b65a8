package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All banded MinHash keys of a shingle array in ONE kernel call.
  *
  * Drop-in equivalent of the explode+HashAggregate formulation — base
  * hash `xxhash64(shingle)`, k seeded signatures `min(xxhash64(h, i))`,
  * band key `xxhash64(array(m_band..), band)` — replaying Spark's exact
  * XxHash64 seed chains (seed 42, each argument folded with the running
  * hash as seed, arrays element-folded), so keys are bit-identical to
  * the previous formulation and to any band-key STORE it wrote. The
  * aggregate shape paid a row blowup to |shingles| plus a full shuffle
  * into the k-column min aggregate; this runs one shingles×k min loop
  * per row inside whole-stage codegen — the minhash signature becomes a
  * map-side projection and the pipeline's first shuffle moves to the
  * band-key self-join.
  *
  * Empty/null shingle arrays yield an EMPTY key array (the caller's
  * explode then drops the document, matching the old filtered path).
  */
case class MinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (bands > 0 && rowsPerBand > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires positive bands/rowsPerBand: $bands×$rowsPerBand")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinhashBands.bandKeys(child.eval(input).asInstanceOf[ArrayData],
      bands, rowsPerBand)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val cls = MinhashBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.bandKeys(${childGen.isNull} ? null : ${childGen.value},
            $bands, $rowsPerBand);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {

  def apply(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    GraftExpressionBridge.column(MinhashBands(
      GraftExpressionBridge.expression(shingles), bands, rowsPerBand))

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Row kernel — called once per row from generated code. */
  def bandKeys(shingles: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    if (shingles == null || shingles.numElements() == 0) return Empty
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val u = shingles.getUTF8String(s)
      // xxhash64(shingle): seed 42 over the UTF-8 bytes
      val base = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, 42L)
      // xxhash64(h, i) folds h (long) then the INT literal i with the
      // running hash as seed — int literals hash via hashInt
      val hb = XXH64.hashLong(base, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, hb)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      // xxhash64(array(m..), b): element-fold the long slice, then fold
      // the INT literal b via hashInt
      var acc = 42L
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(mins(b * rowsPerBand + r), acc)
        r += 1
      }
      out(b) = XXH64.hashInt(b, acc)
      b += 1
    }
    new GenericArrayData(out)
  }
}
