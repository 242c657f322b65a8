package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality signals: counts, mean length, punct + stopword ratios") {
    val df = Seq((1L, "The cat, and the dog!")).toDF("id", "text")
    val r = TextAnalysis.withQualitySignals(df, "text").collect()(0)
    r.getAs[Long]("token_count") shouldBe 5
    r.getAs[Long]("char_count") shouldBe 21
    // tokens lowered: the cat, and the dog! -> lengths 3+4+3+3+4 = 17
    r.getAs[Double]("mean_token_len") shouldBe 17.0 / 5
    r.getAs[Double]("punct_ratio") shouldBe 2.0 / 21
    r.getAs[Double]("stopword_ratio") shouldBe 3.0 / 5 // the, and, the
  }

  test("bpe-ish segment count splits words and punctuation") {
    val df = Seq("don't stop, now").toDF("text")
    // don + ' + t + stop + , + now = 6
    df.select(TextAnalysis.bpeishTokenCount(col("text")))
      .as[Long].collect()(0) shouldBe 6
  }

  test("language ID picks the max-scoring stopword list with tiebreak") {
    val df = Seq(
      (1L, "the cat and the dog is happy"), // en
      (2L, "el perro y la casa que no es"), // es
      (3L, "der hund und die katze von zu"), // de
      (4L, "xyzzy plugh")                    // no stopwords: tie -> de (first)
    ).toDF("id", "text")
    val out = TextAnalysis.withDetectedLanguage(df, "text")
      .select("id", "detected_lang").as[(Long, String)].collect().toMap
    out(1L) shouldBe "en"
    out(2L) shouldBe "es"
    out(3L) shouldBe "de"
    out(4L) shouldBe "de"
  }

  test("repetition signals: dup/top word and bigram fractions (Gopher A1.1)") {
    val df = Seq(
      (1L, "spam spam spam ham"),      // 4 words, 2 distinct, top=3×spam
      (2L, "all words are different"), // no repetition
      (3L, "solo")                     // 1 word → no bigrams (null frac)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getLong(1) shouldBe 4L                         // n_words
    out(1L).getDouble(2) shouldBe 0.5 +- 1e-12             // dup_word_frac
    out(1L).getDouble(3) shouldBe 0.75 +- 1e-12            // top_word_frac
    out(1L).getDouble(4) shouldBe (2.0 / 3) +- 1e-12       // "spam spam" ×2 / 3
    out(2L).getDouble(2) shouldBe 0.0 +- 1e-12
    out(2L).getDouble(4) shouldBe (1.0 / 3) +- 1e-12       // 3 bigrams, all unique
    out(3L).isNullAt(4) shouldBe true                      // < 2 words
  }

  test("gopher filter: each rule fires on its own pathology") {
    val longClean = (1 to 40).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, longClean),                                   // passes everything
      (2L, "too short"),                                 // word-count floor
      (3L, (1 to 40).map(_ => "spam").mkString(" ")),    // dup + top word
      (4L, (1 to 40).map(_ => "!!").mkString(" "))       // punct ratio
    ).toDF("doc_id", "text")
    val rep = TextAnalysis.gopherQualityReport(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    rep(1L).getBoolean(7) shouldBe true   // keep
    rep(2L).getBoolean(1) shouldBe true   // fail_word_count
    rep(2L).getBoolean(7) shouldBe false
    rep(3L).getBoolean(4) shouldBe true   // fail_dup_word
    rep(3L).getBoolean(5) shouldBe true   // fail_top_word
    rep(3L).getBoolean(7) shouldBe false
    rep(4L).getBoolean(3) shouldBe true   // fail_punct_ratio
    rep(4L).getBoolean(7) shouldBe false
    TextAnalysis.gopherQualityFilter(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("a  B\tc", "A b C")).toDF("x", "y")
    val r = df.select(
      TextAnalysis.fingerprint(col("x")).as("fx"),
      TextAnalysis.fingerprint(col("y")).as("fy")).collect()(0)
    r.getString(0) shouldBe r.getString(1)
  }

  test("vocabTopK: tf sums per-doc counts, df counts docs, ties break on token") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry"),
      (3L, "banana")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.vocabTopK(df, "doc_id", "text", k = 3)
      .select("token", "tf", "df_docs", "rank")
      .as[(String, Long, Long, Long)].collect()
    // apple tf=3 df=2; banana tf=2 df=2; cherry tf=2 df=1 (tie: banana < cherry)
    top shouldBe Array(
      ("apple", 3L, 2L, 1L),
      ("banana", 2L, 2L, 2L),
      ("cherry", 2L, 1L, 3L))
  }

  test("vocabTopK plan: top-k without a global sort") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.vocabTopK(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("tokenLengthHistogram buckets by width") {
    val df = Seq(
      (1L, "one two three"),                          // 3 → bucket 0
      (2L, Seq.fill(12)("w").mkString(" ")),          // 12 → bucket 10
      (3L, Seq.fill(10)("w").mkString(" "))           // 10 → bucket 10
    ).toDF("doc_id", "text")
    TextAnalysis.tokenLengthHistogram(df, "text", bucketWidth = 10)
      .as[(Long, Long)].collect().sorted shouldBe Array((0L, 1L), (10L, 2L))
  }

  test("normalizeText: NFC composes, controls strip, CRLF and spaces collapse") {
    val df = Seq(
      (1L, "café  du\t monde\r\nline2 "), // decomposed é
      (2L, "café du monde\nline2"),              // precomposed é
      (3L, (null: String))
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "café du monde\nline2"
    // both encodings of é normalize to the SAME bytes — the reason this
    // runs before fingerprinting
    out(2L) shouldBe out(1L)
    out(3L) shouldBe null
    // the dedup fingerprints now agree
    val fps = df.filter($"text".isNotNull).select(
      Dedup.fingerprint(TextAnalysis.normalizeText($"text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    fps.size shouldBe 1
  }

  test("normalizeText is a pure projection — no Exchange") {
    val plan = Seq((1L, "x")).toDF("doc_id", "text")
      .select(TextAnalysis.normalizeText(col("text")))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include("nfcnormalize")
  }

  test("tokenEntropySignals: hand-computed micro-nat entropy, degenerate text scores low") {
    val df = Seq(
      (1L, "a a b"),
      (2L, "spam spam spam spam"),          // zero entropy
      (3L, "u v w x")                       // maximal for 4 tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropySignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: n=3, s = floor(2·ln2·1e6+.5) = 1386294; n·ln n term 3295837
    out(1L) shouldBe ((3L, 2L, 3295837L - 1386294L))
    out(2L)._3 shouldBe 0L                  // all same token
    // uniform doc: ent_micro ≈ n·ln(n)·1e6 (every c = 1)
    out(3L)._3 shouldBe math.floor(4 * math.log(4) * 1e6 + 0.5).toLong
  }

  test("compressionSignals: repetitive text deflates far more than varied text") {
    val varied = (1 to 60).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")
    val spam = "buy now click here " * 30
    val df = Seq((1L, varied), (2L, spam), (3L, null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    out(3L) shouldBe None // null text → null signal, never a crash
    out(2L).get should be > (2.5 * out(1L).get) // spam ≫ varied
    // deterministic rerun
    TextAnalysis.compressionSignals(df, "doc_id", "text").collect()
      .map(_.toString).sorted shouldBe
      TextAnalysis.compressionSignals(df, "doc_id", "text").collect()
        .map(_.toString).sorted
    // pure map-side kernel projection (parquet-backed frame — a local
    // Seq constant-folds the projection into the LocalTableScan)
    val plan = TextAnalysis.compressionSignals(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text").queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should include("deflatelen")
    // the filter keeps varied prose and drops the spam
    TextAnalysis.compressionFilter(df, "text", maxRatio = 4.0)
      .select("doc_id").collect().map(_.getLong(0)) shouldBe Array(1L)
  }

  test("sourceShingleOverlap: directed shared-shingle counts per source pair") {
    // A: two docs whose distinct 3-shingles are {a b c, b c d} ∪ {x y z}
    // B: one doc covering {a b c, b c d}; C: disjoint
    val df = Seq(
      (1L, "a b c d", "A"),
      (2L, "x y z", "A"),
      (3L, "a b c d", "B"),
      (4L, "p q r s", "C")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceShingleOverlap(df, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // A has 3 distinct shingles, B has 2, C has 2; A∩B = 2, others empty
    out shouldBe Set(("A", "B", 2L, 3L), ("B", "A", 2L, 2L))
  }

  test("sourceShingleOverlap: the sizes join is pinned broadcast") {
    val df = Seq((1L, "a b c", "A"), (2L, "a b c", "B"))
      .toDF("doc_id", "text", "source")
    TextAnalysis.sourceShingleOverlap(df, "doc_id", "text", "source")
      .queryExecution.executedPlan.toString should include("BroadcastHashJoin")
  }

  test("repetitionNgramSignals: hand-computed n-gram char fractions") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b"×3,
    // charlen 3, total chars = 11 → top2 = 9/11. dup 5-grams: both
    // 5-grams occur once → 0.0. 10-grams: none (6 tokens) → 0.0.
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "all distinct words here today friend"),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionNgramSignals(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    r(1L).getAs[Double]("top2gram_char_frac") shouldBe (9.0 / 11.0)
    r(1L).getAs[Double]("dup5gram_char_frac") shouldBe 0.0
    r(1L).getAs[Double]("dup10gram_char_frac") shouldBe 0.0
    // doc 1 dup 2..4-gram? top3 = "a b a"×2 or "b a b"×2 → 2*5/11
    r(1L).getAs[Double]("top3gram_char_frac") shouldBe (10.0 / 11.0)
    // all-distinct doc: every gram unique → top fracs = single gram
    // coverage, dup fracs 0
    r(2L).getAs[Double]("dup5gram_char_frac") shouldBe 0.0
    r(2L).getAs[Double]("top2gram_char_frac") should be > 0.0
    // tokenless doc: NULL across the board (rule does not apply)
    (0 until r(3L).length).drop(1).foreach(i => r(3L).isNullAt(i) shouldBe true)
  }

  test("repetitionNgramSignals: top gram is the MOST FREQUENT, not max coverage") {
    // 2-grams of doc: "aa bb"×2 (cov 2·5=10), "bb aa", "bb cc",
    // "cc dddddddddd", "dddddddddd eeeeeeeeee" (cov 21) — the published
    // rule (Rae et al. 2021; DataTrove most_common(1)) selects by COUNT,
    // so top2 = 10/36, not the longer-but-rarer gram's 21/36
    val df = Seq((1L, "aa bb aa bb cc dddddddddd eeeeeeeeee"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionNgramSignals(df, "doc_id", "text")
      .collect().head
    r.getAs[Double]("top2gram_char_frac") shouldBe (10.0 / 36.0)
  }

  test("repetitionNgramSignals: leading tab/newline doc has no phantom grams") {
    // "\ncc dd" has 2 real tokens; the split's leading "" token must not
    // fabricate a 3-gram " cc dd" (pre-fix that gave top3 = 1.0 and the
    // 0.18 threshold dropped an innocent two-word doc). total counts the
    // normalized text " cc dd" (6 chars, the \n collapsed to one space).
    val df = Seq((1L, "\ncc dd"), (2L, "\tfoo bar foo bar"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionNgramSignals(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    r(1L).getAs[Double]("top3gram_char_frac") shouldBe 0.0
    r(1L).getAs[Double]("top2gram_char_frac") shouldBe (5.0 / 6.0)
    // "\tfoo bar foo bar" → tokens foo,bar,foo,bar; top2 "foo bar"×2,
    // cov 14; total " foo bar foo bar" = 16
    r(2L).getAs[Double]("top2gram_char_frac") shouldBe (14.0 / 16.0)
  }

  test("gopherNgramFilter: boilerplate-repetitive doc drops, varied doc survives") {
    val varied = (1 to 80).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val spam = (("click here to buy now " * 20).trim)
    val df = Seq((1L, varied), (2L, spam)).toDF("doc_id", "text")
    TextAnalysis.gopherNgramFilter(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)) shouldBe Array(1L)
  }
}
