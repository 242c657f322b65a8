package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document simhash as ONE native kernel call per row.
  *
  * Drop-in equivalent of the explode+aggregate formulation
  * (`explode(split(lower(trim(text)), "\s+"))` → hash per token → `bits`
  * conditional-sum votes in a HashAggregate → OR-composed bit assembly),
  * bit-for-bit: same tokens (UTF8String trim/toLowerCase then Java regex
  * split, the proven [[TextShingles]] chain), same per-token hash
  * (Spark's `xxhash64` seed-42 over the token's UTF-8 bytes, or the
  * oracle-replayable 60-bit md5 prefix of
  * [[graft.operators.Dedup.md5Hash60]]), same ±1 votes and
  * tally-positive bit rule. The explode+agg shape was the right answer
  * vs interpreted HOF lambdas, but it still paid a row blowup to
  * |tokens| and a full shuffle into the vote aggregate; this runs the
  * whole thing map-side inside whole-stage codegen — the simhash table
  * becomes a PROJECTION, and the first shuffle in every simhash pipeline
  * moves to the (tiny) chunk-key join.
  */
case class SimhashBits(child: Expression, bits: Int, md5: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (bits % 4 == 0 && bits <= 64) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"simhash_bits requires bits ≤ 64, multiple of 4: $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires string, got ${other.catalogString}")
  }

  protected override def nullSafeEval(text: Any): Any =
    SimhashBits.simhash(text.asInstanceOf[UTF8String], bits, md5)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimhashBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.simhash($c, $bits, $md5);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {

  def apply(text: Column, bits: Int, md5: Boolean): Column =
    GraftExpressionBridge.column(
      SimhashBits(GraftExpressionBridge.expression(text), bits, md5))

  private val HexDigits = "0123456789abcdef".toCharArray

  /** First 15 hex digits of md5 as a 60-bit long — the driver-side twin
    * of `conv(substring(md5(tok), 1, 15), 16, 10)` (md5 runs over the
    * token's UTF-8 bytes in both).
    */
  private def md5Hash60(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex digits = first 7 bytes + the high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Spark `xxhash64(tok)`: XXH64 seed 42 over the UTF-8 bytes. */
  private def xxHash(tok: String): Long = {
    val u = UTF8String.fromString(tok)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Row kernel — called once per row from generated code. */
  def simhash(text: UTF8String, bits: Int, md5: Boolean): Long = {
    // UTF8String.trim/toLowerCase are exactly what Spark's trim()/lower()
    // call, and Java regex split matches Spark's split() post-trim (no
    // trailing separators survive the trim), so tokens equal the
    // split(lower(trim(text)), "\s+") column bit-for-bit
    val toks = text.trim().toLowerCase.toString.split("\\s+")
    val votes = new Array[Long](bits)
    var t = 0
    while (t < toks.length) {
      val h = if (md5) md5Hash60(toks(t)) else xxHash(toks(t))
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      t += 1
    }
    var sh = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }
}
