package graft.operators

import org.apache.spark.sql.DataFrame
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
      overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap")
    val stride = maxTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
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
        array_join(
          slice(col("__t"),
            (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)),
          " ").as("chunk_text"),
        least(lit(maxTokens.toLong), col("__n") - col("chunk_idx") * stride)
          .as("n_tokens"))
  }
}
