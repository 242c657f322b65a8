package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-window document chunking — the step that turns curated
  * documents into training-sequence-sized pieces: fixed `maxTokens`
  * windows sliding by `maxTokens - overlap`, so consecutive chunks
  * share `overlap` tokens of context. The last chunk is anchored so the
  * document tail is always covered (it may be shorter than a full
  * window but never empty).
  *
  * Scale shape: tokenize → per-row chunk-index `sequence` → `explode` →
  * `slice`/`array_join` projection. Every function here is a codegen'd
  * collection expression (no lambda higher-order functions, which Spark
  * interprets per element) and the whole operator is shuffle-FREE: chunk
  * rows inherit the parent scan's partitioning, so at 100 TB this runs
  * map-side at scan speed with output size ~ input × (1 + overlap/stride).
  *
  * Nearest reference analog: none (SURVEY.md §2.6) — scale-extension
  * surface alongside [[TextAnalysis]]/[[Sampling]].
  */
object Chunking {

  /** Explode documents into `(id, chunk_idx, chunk_text, n_tokens)`.
    * Chunk `i` covers tokens `[i*stride, i*stride + maxTokens)` where
    * `stride = maxTokens - overlap`; the final index is the smallest
    * whose window reaches the last token, so every token lands in ≥ 1
    * chunk and a short document yields exactly one chunk.
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0,
      tokenizer: Tokenizer = WhitespaceTokenizer): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap")
    val stride = maxTokens - overlap
    val toks = tokenizer.tokenize(col(textCol))
    // iMax = ceil(max(0, n - maxTokens) / stride) in exact long arithmetic
    val extra = greatest(col("__n") - maxTokens, lit(0L))
    val iMax = ((extra + lit(stride.toLong - 1L)) / lit(stride.toLong))
      .cast("long")
    df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), iMax)))
      .select(
        col(idCol),
        col("chunk_idx"),
        tokenizer.detokenize(
          slice(col("__t"),
            (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)))
          .as("chunk_text"),
        least(lit(maxTokens.toLong), col("__n") - col("chunk_idx") * stride)
          .as("n_tokens"))
  }

  /** Sequence packing — the GPT-style pre-training layout: concatenate
    * each group's documents (in id order) into one token stream and cut
    * it into fixed `seqLen` sequences, documents splitting across
    * boundaries. Exact, deterministic, and layout-independent: a doc's
    * global token offset is a per-group running sum, each doc explodes
    * into only the sequences it overlaps, and per-sequence pieces
    * reassemble by offset.
    *
    * Scale shape: two shuffles on the group key (running-sum window,
    * then the per-(group, seq) reassembly — the second reuses the
    * first's partitioning modulo the seq_id extension) and each doc
    * emits ~n/seqLen piece rows; nothing is ever quadratic and no
    * group's token stream is materialized in one place. Groups are the
    * parallelism unit — pack per source/shard (as real pipelines do),
    * not one global stream, or a single window sorts the corpus.
    *
    * Output: `(group, seq_id, seq_text, n_tokens)`; every sequence but
    * each group's last has exactly `seqLen` tokens.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      seqLen: Int,
      tokenizer: Tokenizer = WhitespaceTokenizer): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val L = seqLen.toLong
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
        tokenizer.tokenize(col(textCol)).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") > 0)
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pieces = base
      .withColumn("start", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        expr(s"start div $L"), expr(s"(start + n - 1) div $L"))))
      .withColumn("ps", greatest(col("start"), col("seq_id") * L))
      .withColumn("pe", least(col("start") + col("n"), (col("seq_id") + 1) * L))
      .select(col("g"), col("seq_id"), col("ps"),
        slice(col("t"), (col("ps") - col("start") + 1).cast("int"),
          (col("pe") - col("ps")).cast("int")).as("piece"),
        (col("pe") - col("ps")).as("plen"))
    pieces.groupBy(col("g"), col("seq_id"))
      .agg(
        tokenizer.detokenize(
          flatten(transform(
            array_sort(collect_list(struct(col("ps"), col("piece")))),
            x => x.getField("piece")))).as("seq_text"),
        sum(col("plen")).as("n_tokens"))
      .select(col("g").as(groupCol), col("seq_id"), col("seq_text"),
        col("n_tokens"))
  }
}
