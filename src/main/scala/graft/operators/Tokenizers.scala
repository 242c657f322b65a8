package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer abstraction for the sequence-sizing operators
  * ([[Chunking.chunkByTokens]], [[Chunking.packSequences]],
  * [[Sampling.corpusMixReport]]): a real pre-training pipeline sizes
  * sequences in TOKENIZER tokens, not whitespace words, so every
  * operator that counts or cuts tokens accepts one of these.
  * [[WhitespaceTokenizer]] stays the default (and the DuckDB-oracle
  * path — its tokens are replayable in ANSI SQL); [[BpeTokenizer]] is
  * the production path, loaded from a standard vocab+merges file pair.
  */
trait Tokenizer extends Serializable {

  /** text → array<string> of tokens (a pure Column expression). */
  def tokenize(text: Column): Column

  /** token array → the text it came from (up to tokenizer-lossy
    * whitespace), used to materialize chunk/sequence text.
    */
  def detokenize(tokens: Column): Column
}

/** Lowercased whitespace words — the default and oracle path, identical
  * to [[TextAnalysis.tokens]].
  */
object WhitespaceTokenizer extends Tokenizer {
  def tokenize(text: Column): Column = TextAnalysis.tokens(text)
  def detokenize(tokens: Column): Column = array_join(tokens, " ")
}

/** SentencePiece-style BPE over a merges table (the
  * [[graft.functions.BpeTokens]] native kernel): each word is marked
  * with `▁` and greedily merged by rank, so detokenization is concat +
  * marker-replace and chunk/pack round-trips are exact.
  *
  * Load from the standard two-file layout with [[BpeTokenizer.fromFiles]]
  * (vocab = one token per line, used to sanity-check the merges; merges =
  * one "left right" pair per line, rank = line order, `#`-prefixed header
  * lines skipped) or construct directly from in-memory merges.
  */
final case class BpeTokenizer(merges: Seq[(String, String)]) extends Tokenizer {
  def tokenize(text: Column): Column =
    graft.functions.BpeTokens(text, merges)
  def detokenize(tokens: Column): Column =
    trim(regexp_replace(array_join(tokens, ""),
      graft.functions.BpeTokens.Marker, " "))
}

object BpeTokenizer {

  /** Parse a merges file: one "left right" pair per line in rank order;
    * blank and `#…` header lines skipped.
    */
  def fromMergesFile(mergesPath: String): BpeTokenizer = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mergesPath))
    val merges = scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala
      .iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2, s"merges line needs 'left right': '$l'")
        (sp(0), sp(1))
      }
      .toSeq
    BpeTokenizer(merges)
  }

  /** Two-file layout: every merge's composed token must appear in the
    * vocab (one token per line) — catches a vocab/merges file mismatch
    * at load time instead of as silent mis-segmentation.
    */
  def fromFiles(vocabPath: String, mergesPath: String): BpeTokenizer = {
    val vocab = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(vocabPath))).asScala
      .map(_.trim).filter(_.nonEmpty).toSet
    val tok = fromMergesFile(mergesPath)
    val missing = tok.merges.collect {
      case (a, b) if !vocab.contains(a + b) => a + b
    }
    require(missing.isEmpty,
      s"merges compose tokens absent from vocab: ${missing.take(5).mkString(", ")}")
    tok
  }
}
