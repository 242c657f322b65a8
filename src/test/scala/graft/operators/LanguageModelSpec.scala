package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val fitCorpus = Seq(
    (0L, "the cat sat"),
    (2L, "the cat ran"),
    (4L, "a dog ran")
  ).toDF("doc_id", "text")

  test("bigramCounts pairs adjacent tokens with counts; short docs contribute nothing") {
    val bg = LanguageModel.bigramCounts(
      Seq((0L, "a b c"), (1L, "solo"), (2L, "  x   y  "), (3L, ""),
        (4L, "p q p q"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    bg.toSet shouldBe Set((0L, "a", "b", 1L), (0L, "b", "c", 1L),
      (2L, "x", "y", 1L),
      // within-doc pre-aggregation: "q p" once, "p q" twice, one row each
      (4L, "p", "q", 2L), (4L, "q", "p", 1L))
  }

  test("fit: exact bigram, context, unigram counts and (T, V)") {
    val m = LanguageModel.fitBigramModel(fitCorpus, "doc_id", "text")
    val cb = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    cb(("the", "cat")) shouldBe ((2L, 2L)) // cb=2, c1("the")=2
    cb(("cat", "sat")) shouldBe ((1L, 2L)) // c1("cat")=2
    cb(("dog", "ran")) shouldBe ((1L, 1L))
    m.totalTokens shouldBe 9L
    m.vocabSize shouldBe 6L // the cat sat ran a dog
    m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .apply("ran") shouldBe 2L
  }

  test("score: seen bigrams use cb/c1, unseen back off, OOV floors") {
    val m = LanguageModel.fitBigramModel(fitCorpus, "doc_id", "text")
    val batch = Seq((1L, "the cat sat"), (3L, "the zebra")).toDF("doc_id", "text")
    val out = LanguageModel.scoreBigrams(batch, m, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    // doc 1: (the,cat) seen 2/2; (cat,sat) seen 1/2
    val d1 = micro(math.log(2.0 / 2.0)) + micro(math.log(1.0 / 2.0))
    out(1L)._1 shouldBe 2L
    out(1L)._2 shouldBe d1
    out(1L)._3 shouldBe d1.toDouble / 2.0
    // doc 3: (the,zebra) unseen, zebra OOV: ln(0.4·(0+1)/(9+6))
    val d3 = micro(math.log(0.4 * 1.0 / 15.0))
    out(3L) shouldBe ((1L, d3, d3.toDouble))
  }

  test("backoff uses the unigram count of the SECOND token when unseen") {
    val m = LanguageModel.fitBigramModel(fitCorpus, "doc_id", "text")
    // (sat, ran): bigram unseen, but "ran" has cu=2 → ln(0.4·3/15)
    val out = LanguageModel.scoreBigrams(
      Seq((9L, "sat ran")).toDF("doc_id", "text"), m, "doc_id", "text")
      .collect().head
    out.getLong(2) shouldBe math.floor(math.log(0.4 * 3.0 / 15.0) * 1e6 + 0.5).toLong
  }

  test("persisted model store round-trips bit-identically") {
    val m = LanguageModel.fitBigramModel(fitCorpus, "doc_id", "text")
    val batch = Seq((1L, "the cat sat zebra quokka"), (5L, "a dog ran fast"))
      .toDF("doc_id", "text")
    val direct = LanguageModel.scoreBigrams(batch, m, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val store = java.nio.file.Files
      .createTempDirectory("lm-store-").toString + "/lm"
    LanguageModel.saveModel(m, store)
    val loaded = LanguageModel.loadModel(spark, store)
    loaded.totalTokens shouldBe m.totalTokens
    loaded.vocabSize shouldBe m.vocabSize
    LanguageModel.scoreBigrams(batch, loaded, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1) shouldBe direct
  }

  test("append + load equals a joint fit; compaction preserves scores") {
    val a = fitCorpus
    val b = Seq((6L, "the dog sat"), (8L, "a cat ran far")).toDF("doc_id", "text")
    val probe = Seq((1L, "the cat sat far"), (3L, "dog ran quokka"))
      .toDF("doc_id", "text")
    def scores(m: LanguageModel.BigramModel) =
      LanguageModel.scoreBigrams(probe, m, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
    val joint = scores(LanguageModel.fitBigramModel(a.unionByName(b), "doc_id", "text"))
    val store = java.nio.file.Files
      .createTempDirectory("lm-inc-").toString + "/lm"
    LanguageModel.saveModel(
      LanguageModel.fitBigramModel(a, "doc_id", "text"), store)
    LanguageModel.appendModelCounts(b, "doc_id", "text", store)
    val merged = LanguageModel.loadModel(spark, store)
    merged.totalTokens shouldBe 9L + 7L
    merged.vocabSize shouldBe 7L // fit vocab + {far}; every other B token shared
    scores(merged) shouldBe joint
    LanguageModel.compactModel(spark, store)
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, "deltas")) shouldBe false
    scores(LanguageModel.loadModel(spark, store)) shouldBe joint
    // compacted load is the fast path: c1 rides the stored row again
    LanguageModel.loadModel(spark, store).bigrams.columns should
      contain allOf ("w1", "w2", "cb", "c1")
  }

  test("rankBuckets: equal rank terciles per stratum, head = best score") {
    val scored = Seq(
      // lang a: 6 docs, scores descending with id — buckets 0,0,1,1,2,2
      (1L, "a", -1.0), (2L, "a", -2.0), (3L, "a", -3.0),
      (4L, "a", -4.0), (5L, "a", -5.0), (6L, "a", -6.0),
      // lang b: 4 docs — floor((r-1)*3/4) = 0,0,1,2
      (7L, "b", -1.0), (8L, "b", -2.0), (9L, "b", -3.0), (10L, "b", -4.0)
    ).toDF("doc_id", "lang", "avg_lognat")
    val out = LanguageModel.rankBuckets(scored, "lang", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    out(1L) shouldBe ((1L, 0L)); out(2L) shouldBe ((2L, 0L))
    out(3L) shouldBe ((3L, 1L)); out(6L) shouldBe ((6L, 2L))
    out(7L) shouldBe ((1L, 0L)); out(9L) shouldBe ((3L, 1L))
    out(10L) shouldBe ((4L, 2L))
    // ties break by id: equal scores get deterministic ranks
    val tied = Seq((1L, "a", -1.0), (2L, "a", -1.0), (3L, "a", -1.0))
      .toDF("doc_id", "lang", "avg_lognat")
    LanguageModel.rankBuckets(tied, "lang", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap shouldBe
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
  }

  test("in-distribution text outscores shuffled text (the CCNet signal)") {
    val wide = (0L until 40L)
      .map(i => (i, "the cat sat on the mat and the dog ran"))
      .toDF("doc_id", "text")
    val m = LanguageModel.fitBigramModel(wide, "doc_id", "text")
    val probe = Seq(
      (100L, "the cat sat on the mat"), // fit-corpus word order
      (101L, "mat the on sat cat the")  // same tokens, shuffled
    ).toDF("doc_id", "text")
    val s = LanguageModel.scoreBigrams(probe, m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    s(100L) should be > s(101L)
  }
}
