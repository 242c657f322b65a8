package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking: window/overlap arithmetic, tail coverage, single-chunk
  * shorts, the shuffle-free plan shape, and BPE-tokenizer cutting.
  */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("windows slide by stride and the tail is always covered") {
    // 10 tokens, maxTokens=4, overlap=1 → stride 3, starts 0,3,6 → last
    // window [6,10) catches the tail
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", maxTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    out shouldBe Array(
      (0L, "t1 t2 t3 t4", 4L),
      (1L, "t4 t5 t6 t7", 4L),
      (2L, "t7 t8 t9 t10", 4L))
    // every token appears; consecutive chunks share exactly `overlap`
    out.sliding(2).foreach { case Array((_, a, _), (_, b, _)) =>
      a.split(" ").last shouldBe b.split(" ").head
    }
  }

  test("short documents yield exactly one (possibly partial) chunk") {
    val df = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", maxTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    out(1L) shouldBe (("a b c", 3L))
    out(2L) shouldBe (("solo", 1L))
  }

  test("non-divisible tail gets a shorter final chunk, never empty") {
    // 7 tokens, maxTokens=4, overlap=0 → chunks [0,4) and [4,7)
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", maxTokens = 4)
      .orderBy("chunk_idx").collect().map(r => (r.getString(2), r.getLong(3)))
    out shouldBe Array(("a b c d", 4L), ("e f g", 3L))
  }

  test("packing: fixed-length sequences, docs split across boundaries") {
    // group g: docs of 3, 4, 2 tokens; seqLen 4 → stream of 9 tokens →
    // sequences [a b c | d], [e f g | h], [i]
    val df = Seq(
      (1L, "a b c", "g"), (2L, "d e f g", "g"), (3L, "h i", "g"),
      (4L, "x y", "h")
    ).toDF("doc_id", "text", "source")
    val out = Chunking.packSequences(df, "doc_id", "text", "source", seqLen = 4)
      .orderBy("source", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    out shouldBe Array(
      ("g", 0L, "a b c d", 4L),
      ("g", 1L, "e f g h", 4L),
      ("g", 2L, "i", 1L),
      ("h", 0L, "x y", 2L))
  }

  test("packing is layout-independent (repartition yields identical sequences)") {
    val df = Seq.tabulate(30)(i => (i.toLong, s"w$i w$i w$i", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = Chunking.packSequences(df, "doc_id", "text", "source", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val b = Chunking.packSequences(df.repartition(11), "doc_id", "text", "source", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    b shouldBe a
  }

  test("chunking is a shuffle-free generate+project plan") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = Chunking.chunkByTokens(df, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
  }

  // tiny BPE: merges build "▁hello" into one token, leave "world" as
  // [▁, w, or, l, d] (only "o r" ranked)
  private val tinyMerges = Seq(
    "l" -> "l", "e" -> "ll", "h" -> "ell", "hell" -> "o",
    "▁" -> "hello", "o" -> "r")

  test("BPE tokenizer: greedy merges, exact detokenize round-trip") {
    val tok = BpeTokenizer(tinyMerges)
    val df = Seq(Tuple1("hello hello world")).toDF("text")
    val pieces = df.select(tok.tokenize(col("text"))).collect()(0).getSeq[String](0)
    pieces shouldBe Seq("▁hello", "▁hello", "▁", "w", "or", "l", "d")
    df.select(tok.detokenize(tok.tokenize(col("text"))))
      .collect()(0).getString(0) shouldBe "hello hello world"
  }

  test("BPE tokenizer: vocab+merges files round-trip; vocab mismatch fails") {
    val dir = java.nio.file.Files.createTempDirectory("bpe")
    val merges = dir.resolve("merges.txt")
    java.nio.file.Files.writeString(merges,
      "#version: tiny\n" + tinyMerges.map { case (a, b) => s"$a $b" }.mkString("\n"))
    val vocab = dir.resolve("vocab.txt")
    java.nio.file.Files.writeString(vocab,
      Seq("ll", "ell", "hell", "hello", "▁hello", "or").mkString("\n"))
    val tok = BpeTokenizer.fromFiles(vocab.toString, merges.toString)
    tok.merges shouldBe tinyMerges
    // a vocab missing a composed token fails loudly at load time
    java.nio.file.Files.writeString(vocab,
      Seq("ll", "ell", "hell", "hello", "or").mkString("\n")) // no ▁hello
    an[IllegalArgumentException] should be thrownBy
      BpeTokenizer.fromFiles(vocab.toString, merges.toString)
  }

  test("chunking and packing cut in BPE tokens when given the tokenizer") {
    val tok = BpeTokenizer(tinyMerges)
    val df = Seq((1L, "hello hello world")).toDF("doc_id", "text")
    // 7 BPE tokens → two maxTokens=4 chunks; text reassembles via markers
    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", 4,
        tokenizer = tok)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getString(2), r.getLong(3)))
    chunks shouldBe Array(("hello hello w", 4L), ("orld", 3L))
    val packed = Chunking.packSequences(
        df.withColumn("source", lit("g")), "doc_id", "text", "source", 4,
        tokenizer = tok)
      .orderBy("seq_id")
      .collect().map(r => (r.getString(2), r.getLong(3)))
    packed shouldBe Array(("hello hello w", 4L), ("orld", 3L))
  }
}
