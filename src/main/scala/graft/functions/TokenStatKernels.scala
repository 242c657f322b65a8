package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-DOCUMENT token-statistic kernels (optimization round r21).
  *
  * Every aggregation these kernels replace was PER DOCUMENT: the old
  * plans exploded each document into (id, token)/(id, gram) rows,
  * shuffled the whole corpus' token stream, and hash-aggregated it back
  * to one row per document — work whose only cross-row mixing was rows
  * of the SAME document, i.e. rows generated from the SAME input row.
  * Each kernel computes the identical aggregate inside whole-stage
  * codegen with one static call per row: no generator explosion, no
  * exchange, no aggregation hash map proportional to corpus size — the
  * entire pass runs at scan speed and scales linearly by construction
  * (the r20 scale probe measured the exploded form super-linear at the
  * 10× leg from aggregation/spill pressure).
  *
  * Exactness contract (oracle rows stay hash-identical):
  *  - tokenizer = `UTF8String.trim().toLowerCase.toString.split("\\s+")`
  *    with empty tokens dropped — byte-for-byte the Column formulation
  *    `filter(split(lower(trim(text)), "\\s+"), t => t <> '')`;
  *  - counts group by the exact token/gram STRING (word stats) or by
  *    `xxhash64` of the gram bytes (n-gram stats) — the same keys the
  *    replaced groupBys used, so even hash-collision behavior matches;
  *  - every floating-point expression mirrors the replaced Column
  *    arithmetic token for token (same association, same `Math.log`
  *    floor/quantization), so IEEE doubles agree bit-for-bit.
  *
  * Doctrine note: judging is per ROW. The replaced groupBy(id) forms
  * would have merged counts across duplicate ids; every registered
  * caller feeds unique ids (and the operator docs never promised merged
  * semantics), so the per-row form is the contract now.
  */
object TokenStatKernels {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Driver/executor twin of [[graft.operators.Dedup.md5Hash60]]:
    * first 15 hex digits of md5 parsed as a long (60 bits, positive).
    */
  private def md5Long60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    // first 15 hex digits = first 7.5 bytes: 60 bits big-endian
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  private def xxh64(bytes: Array[Byte], len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)

  /** Non-empty tokens of lowercased trimmed text (split("\\s+") emits at
    * most one empty token, at position 0, when the text begins with
    * non-space whitespace — drop it, matching the `t <> ''` filters).
    */
  private def nonEmptyTokens(text: UTF8String): Array[String] = {
    val toks = text.trim().toLowerCase.toString.split("\\s+")
    if (toks.length > 0 && toks(0).isEmpty) java.util.Arrays.copyOfRange(toks, 1, toks.length)
    else toks
  }

  /** floor(c·ln(c)·1e6 + 0.5) as a long — the shared micro/milli-nat
    * half-up quantization, association identical to the Column form
    * `floor(col * log(col) * 1e6 + 0.5).cast("long")`.
    */
  private def entTerm(c: Long): Long =
    math.floor(c.toDouble * math.log(c.toDouble) * 1e6 + 0.5).toLong

  // ------------------------------------------------------- word stats

  /** [[WordRepetitionStats]] row kernel. Null `text` or a tokenless
    * document returns the all-null row (the replaced aggregation had no
    * row for those documents — callers filter on `n_words IS NOT NULL`
    * where the old plan dropped them).
    */
  def wordStats(text: UTF8String): InternalRow = {
    if (text == null) return WordNullRow
    val toks = nonEmptyTokens(text)
    val m = toks.length
    if (m == 0) return WordNullRow
    val counts = new java.util.HashMap[String, Long](m * 2)
    var i = 0
    while (i < m) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    var maxWc = 0L
    var entS = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > maxWc) maxWc = c
      entS += entTerm(c)
    }
    var nBigrams: Any = null
    var maxBc: Any = null
    if (m >= 2) {
      val bg = new java.util.HashMap[String, Long](m * 2)
      val sb = new java.lang.StringBuilder(64)
      i = 0
      while (i < m - 1) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1))
        bg.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      var mb = 0L
      val bit = bg.values().iterator()
      while (bit.hasNext) { val c = bit.next(); if (c > mb) mb = c }
      nBigrams = (m - 1).toLong
      maxBc = mb
    }
    new GenericInternalRow(Array[Any](m.toLong, counts.size.toLong, maxWc,
      entS, nBigrams, maxBc))
  }

  private val WordNullRow =
    new GenericInternalRow(Array[Any](null, null, null, null, null, null))

  // ---------------------------------------------------- n-gram stats

  private val TopNs = Array(2, 3, 4)
  private val DupNs = Array(5, 6, 7, 8, 9, 10)

  /** Java-regex `\s` (the ASCII class `split`/`regexp_replace` use). */
  private def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'

  /** Code-point length of `regexp_replace(lowered, "\\s+", " ")`: each
    * maximal whitespace run counts 1, every other code point counts 1 —
    * without materializing the replaced string.
    */
  private def normalizedLen(lowered: String): Long = {
    var total = 0L
    var i = 0
    var inRun = false
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      if (isJavaSpace(cp)) {
        if (!inRun) { total += 1; inRun = true }
      } else { total += 1; inRun = false }
      i += Character.charCount(cp)
    }
    total
  }

  /** [[RepetitionNgramStats]] row kernel: the Gopher n-gram repetition
    * fractions of one document — top-{2,3,4}-gram and dup-{5..10}-gram
    * char coverage over the whitespace-normalized char total. Exactly
    * the numbers the old tall-explode plan produced: grams keyed by
    * seed-42 xxhash64 of the gram bytes (collisions merge, `len` takes
    * the group max), top gram = max(c·2³¹ + len) decoded to c·len, dup
    * coverage = Σ_{c≥2} c·maxLen. Documents with no gram of ANY size
    * (fewer than 2 tokens, or null text) return the all-null row —
    * the replaced left join restored those ids with NULLs.
    */
  def ngramStats(text: UTF8String): InternalRow = {
    if (text == null) return NgramNullRow
    val lowered = text.trim().toLowerCase.toString
    val toks0 = lowered.split("\\s+")
    val off = if (toks0.length > 0 && toks0(0).isEmpty) 1 else 0
    val m = toks0.length - off
    if (m < 2) return NgramNullRow
    val total = normalizedLen(lowered)
    val tokBytes = new Array[Array[Byte]](m)
    val tokChars = new Array[Int](m)
    var i = 0
    while (i < m) {
      val s = toks0(off + i)
      tokBytes(i) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      tokChars(i) = s.codePointCount(0, s.length)
      i += 1
    }
    val out = new Array[Any](9)
    var scratch = new Array[Byte](256)
    // (c, maxLen) per gram hash; one map reused across sizes
    val map = new java.util.HashMap[java.lang.Long, Array[Long]](m * 2)
    var fi = 0
    var t = 0
    while (t < 9) {
      val n = if (t < 3) TopNs(t) else DupNs(t - 3)
      if (m >= n) {
        map.clear()
        var blen = n - 1
        var chars = (n - 1).toLong
        var j = 0
        while (j < n) { blen += tokBytes(j).length; chars += tokChars(j); j += 1 }
        var g = 0
        while (g <= m - n) {
          if (g > 0) {
            blen += tokBytes(g + n - 1).length - tokBytes(g - 1).length
            chars += tokChars(g + n - 1) - tokChars(g - 1)
          }
          if (scratch.length < blen)
            scratch = new Array[Byte](math.max(blen, scratch.length * 2))
          var p = 0
          j = 0
          while (j < n) {
            if (j > 0) { scratch(p) = ' '.toByte; p += 1 }
            val b = tokBytes(g + j)
            System.arraycopy(b, 0, scratch, p, b.length)
            p += b.length
            j += 1
          }
          val h = xxh64(scratch, p)
          val e = map.get(h)
          if (e == null) map.put(h, Array(1L, chars))
          else { e(0) += 1; if (chars > e(1)) e(1) = chars }
          g += 1
        }
        if (t < 3) {
          // top gram by packed (count, len) max — c·2³¹ + len, the same
          // order-isomorphic packing the replaced aggregate used
          var best = 0L
          val it = map.values().iterator()
          while (it.hasNext) {
            val e = it.next()
            val packed = e(0) * (1L << 31) + e(1)
            if (packed > best) best = packed
          }
          val cov = (best >> 31) * (best & ((1L << 31) - 1))
          out(fi) = cov.toDouble / total.toDouble
        } else {
          var dup = 0L
          val it = map.values().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e(0) >= 2) dup += e(0) * e(1)
          }
          out(fi) = dup.toDouble / total.toDouble
        }
      } else out(fi) = 0.0
      fi += 1
      t += 1
    }
    new GenericInternalRow(out)
  }

  private val NgramNullRow = new GenericInternalRow(new Array[Any](9))

  // ------------------------------------------------- postings kernel

  /** [[TokenTfLen]] row kernel: (document length, per-token term
    * frequencies) — the per-document slice of the inverted index, in
    * first-occurrence token order. Tokenless/null documents return the
    * all-null row (the replaced (doc, tok) aggregation had no rows).
    */
  def tokenTfs(text: UTF8String): InternalRow = {
    if (text == null) return TfNullRow
    val toks = nonEmptyTokens(text)
    val m = toks.length
    if (m == 0) return TfNullRow
    val counts = new java.util.LinkedHashMap[String, Array[Long]](m * 2)
    var i = 0
    while (i < m) {
      val e = counts.get(toks(i))
      if (e == null) counts.put(toks(i), Array(1L)) else e(0) += 1
      i += 1
    }
    val arr = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      arr(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue()(0)))
      k += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, new GenericArrayData(arr)))
  }

  private val TfNullRow = new GenericInternalRow(Array[Any](null, null))

  /** [[BigramTfs]] row kernel: distinct adjacent token pairs with their
    * within-document occurrence counts, first-occurrence order. Empty
    * array for docs with fewer than 2 tokens (the replaced
    * transform+explode produced no rows).
    */
  def bigramTfs(text: UTF8String): ArrayData = {
    if (text == null) return EmptyArray
    val toks = nonEmptyTokens(text)
    val m = toks.length
    if (m < 2) return EmptyArray
    val counts = new java.util.LinkedHashMap[String, Array[Long]](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m - 1) {
      sb.setLength(0)
      // tokens never contain whitespace (they were split on it), so
      // "w1 w2" is an injective key and the FIRST space recovers w1
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      val e = counts.get(sb.toString)
      if (e == null) counts.put(sb.toString, Array(1L)) else e(0) += 1
      i += 1
    }
    val arr = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val sep = e.getKey.indexOf(' ')
      arr(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey.substring(0, sep)),
        UTF8String.fromString(e.getKey.substring(sep + 1)),
        e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(arr)
  }

  // --------------------------------------------------- tfidf buckets

  /** [[TfidfBucketTfs]] row kernel: term frequency per feature-hash
    * bucket (md5-60 % buckets — [[graft.operators.Tfidf.bucketOf]]),
    * bucket-ascending. Empty array for tokenless/null documents (the
    * replaced explode produced no rows). md5 runs once per DISTINCT
    * token, not per occurrence — same bucket values, fewer digests.
    */
  def bucketTfs(text: UTF8String, buckets: Int): ArrayData = {
    if (text == null) return EmptyArray
    val toks = nonEmptyTokens(text)
    val m = toks.length
    if (m == 0) return EmptyArray
    val counts = new java.util.HashMap[String, Array[Long]](m * 2)
    var i = 0
    while (i < m) {
      val e = counts.get(toks(i))
      if (e == null) counts.put(toks(i), Array(1L)) else e(0) += 1
      i += 1
    }
    val byBucket = new java.util.TreeMap[java.lang.Long, Array[Long]]()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = md5Long60(e.getKey.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)) % buckets
      val acc = byBucket.get(b)
      if (acc == null) byBucket.put(b, Array(e.getValue()(0)))
      else acc(0) += e.getValue()(0)
    }
    val arr = new Array[Any](byBucket.size)
    val bit = byBucket.entrySet().iterator()
    var k = 0
    while (bit.hasNext) {
      val e = bit.next()
      arr(k) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(arr)
  }

  // ------------------------------------------------ distinct hashes

  /** [[DistinctTokenHashes]] row kernel: seed-42 xxhash64 of each
    * distinct token, first-occurrence order. Distinctness is by token
    * STRING (two distinct tokens colliding to one hash emit two equal
    * hashes — bit-faithful to `tokens.distinct()` then `xxhash64`).
    */
  def distinctTokenHashes(text: UTF8String): ArrayData = {
    if (text == null) return EmptyArray
    val toks = nonEmptyTokens(text)
    if (toks.length == 0) return EmptyArray
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val b = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(k) = xxh64(b, b.length)
      k += 1
    }
    new GenericArrayData(out)
  }

  private val EmptyArray = new GenericArrayData(Array.empty[Any])
}

/** Identity wrapper that BLOCKS alias substitution: marked
  * non-deterministic (while computing exactly its child), so the
  * optimizer neither pushes filters through a projection that
  * materializes it nor collapses that projection into consumers —
  * the pattern §4.4 of the optimization playbook describes for
  * expensive expressions the plan references many times. Used around
  * the per-document stat kernels at FILTER call sites: a gate
  * predicate reads 4–8 fields of the kernel struct, and predicate
  * pushdown (which has no expression-cost guard) would otherwise
  * inline one kernel call PER FIELD REFERENCE into the filter, where
  * codegen does no subexpression elimination (short-circuit
  * semantics) — 6–8 tokenize passes per row instead of one.
  * Evaluation and codegen are pure pass-through.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): OptimizerBarrier = copy(child = newChild)
}

object OptimizerBarrier {
  def apply(c: Column): Column =
    GraftExpressionBridge.column(
      OptimizerBarrier(GraftExpressionBridge.expression(c)))
}

/** Per-document word/bigram repetition + entropy statistics as ONE
  * codegen'd struct: n_words, n_distinct, max word count, the entropy
  * micro-nat numerator sum Σ floor(c·ln c·1e6 + 0.5), bigram total and
  * max bigram count (null for sub-2-token docs). Tokenless documents
  * yield all-null fields. Replaces two explode → groupBy(id, token) →
  * groupBy(id) chains and their join — see [[TokenStatKernels]].
  */
case class WordRepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType),
    StructField("n_distinct", LongType),
    StructField("max_wc", LongType),
    StructField("ent_s", LongType),
    StructField("n_bigrams", LongType),
    StructField("max_bc", LongType)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStatKernels.wordStats(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TokenStatKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $cls.wordStats(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordRepetitionStats = copy(child = newChild)
}

object WordRepetitionStats {
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      WordRepetitionStats(GraftExpressionBridge.expression(text)))
}

/** Per-document Gopher n-gram repetition fractions as ONE codegen'd
  * struct of 9 doubles (top-{2,3,4}-gram, dup-{5..10}-gram char
  * coverage). All-null fields for docs with fewer than 2 tokens.
  * Replaces the 9-grams-per-token tall explode + two corpus-wide
  * aggregations + restore join — see [[TokenStatKernels.ngramStats]].
  */
case class RepetitionNgramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    Seq(2, 3, 4).map(n => StructField(s"top${n}gram_char_frac", DoubleType)) ++
      (5 to 10).map(n => StructField(s"dup${n}gram_char_frac", DoubleType)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStatKernels.ngramStats(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TokenStatKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $cls.ngramStats(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionNgramStats = copy(child = newChild)
}

object RepetitionNgramStats {
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      RepetitionNgramStats(GraftExpressionBridge.expression(text)))
}

/** Per-document inverted-index slice as ONE codegen'd struct:
  * `len` = token count, `tfs` = array<(tok, tf)> in first-occurrence
  * order. All-null fields for tokenless docs. Replaces the
  * explode → groupBy(doc, tok) term-frequency aggregation and the
  * per-doc length aggregate + join of every BM25 index build — see
  * [[TokenStatKernels.tokenTfs]].
  */
case class TokenTfLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("len", LongType),
    StructField("tfs", ArrayType(StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false))))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStatKernels.tokenTfs(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TokenStatKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $cls.tokenTfs(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenTfLen = copy(child = newChild)
}

object TokenTfLen {
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      TokenTfLen(GraftExpressionBridge.expression(text)))
}

/** Per-document hashed-TF-IDF buckets as ONE codegen'd
  * array<(bucket, tf)> (md5-60 feature hash, bucket-ascending; empty
  * for tokenless docs). Replaces the explode → groupBy(id, bucket)
  * term-frequency aggregation of the TF-IDF vectorizer — see
  * [[TokenStatKernels.bucketTfs]].
  */
case class TfidfBucketTfs(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStatKernels.bucketTfs(
      child.eval(input).asInstanceOf[UTF8String], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TokenStatKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.bucketTfs(${childGen.isNull} ? null : ${childGen.value}, $buckets);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TfidfBucketTfs = copy(child = newChild)
}

object TfidfBucketTfs {
  def apply(text: Column, buckets: Int): Column =
    GraftExpressionBridge.column(
      TfidfBucketTfs(GraftExpressionBridge.expression(text), buckets))
}

/** Per-document adjacent-bigram counts as ONE codegen'd
  * array<(w1, w2, n)> (distinct pairs, within-doc occurrence counts,
  * first-occurrence order; empty for sub-2-token docs). Replaces the
  * transform+explode → groupBy(id, w1, w2) count of the LM scorer —
  * per-document work that paid a corpus-wide exchange — and feeds the
  * fit's (w1, w2) count as map-side pre-aggregated rows.
  */
case class BigramTfs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStatKernels.bigramTfs(child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TokenStatKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.bigramTfs(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BigramTfs = copy(child = newChild)
}

object BigramTfs {
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      BigramTfs(GraftExpressionBridge.expression(text)))
}

/** Distinct-token seed-42 xxhash64 values of a document as ONE
  * codegen'd array<long> (first-occurrence order; empty for
  * tokenless docs). Replaces explode → distinct → xxhash64 — the
  * (id, token-string) distinct exchange disappears; distinctness is
  * per document, which is all the replaced per-id distinct ever mixed.
  */
case class DistinctTokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStatKernels.distinctTokenHashes(
      child.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = TokenStatKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.distinctTokenHashes(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DistinctTokenHashes = copy(child = newChild)
}

object DistinctTokenHashes {
  def apply(text: Column): Column =
    GraftExpressionBridge.column(
      DistinctTokenHashes(GraftExpressionBridge.expression(text)))
}
