package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling: scores prefer target-like documents, the
  * selection is a deterministic weighted draw, integer quantization is
  * pinned, and the selection plans as a bounded-heap top-k.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // two disjoint vocabularies: "science" target flavor vs "spam" raw
  private def flavored(n: Int, vocab: Seq[String], from: Int) =
    (0 until n).map { i =>
      val words = (0 until 20).map(j => vocab((i * 7 + j) % vocab.size))
      ((from + i).toLong, words.mkString(" "))
    }

  private val sci = Seq("atom", "cell", "gene", "star", "quark", "enzyme")
  private val spam = Seq("click", "free", "winner", "prize", "offer", "deal")

  private lazy val raw =
    (flavored(40, sci, 0) ++ flavored(40, spam, 1000)).toDF("doc_id", "text")
  private lazy val target = flavored(10, sci, 5000).toDF("doc_id", "text")

  test("weights: target-vocabulary documents outscore off-domain ones") {
    val w = Sampling.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sciScores = (0 until 40).map(i => w(i.toLong))
    val spamScores = (0 until 40).map(i => w(1000L + i))
    sciScores.min should be > spamScores.max
    // every document has all 20 tokens counted
    val n = Sampling.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    n shouldBe Set(20L)
  }

  test("resample: selects the target-like half almost exclusively, deterministically") {
    val pick = Sampling.importanceResample(raw, target, "doc_id", "text", k = 30)
    val ids = pick.collect().map(_.getLong(0)).toSet
    ids.size shouldBe 30
    // the score gap between vocabularies dwarfs the Gumbel noise here,
    // so the draw concentrates on the science docs
    ids.count(_ < 1000L) should be >= 28
    // identical rerun → identical set; different seed → different order stats
    Sampling.importanceResample(raw, target, "doc_id", "text", k = 30)
      .collect().map(_.getLong(0)).toSet shouldBe ids
    val other = Sampling.importanceResample(raw, target, "doc_id", "text",
      k = 30, seed = 7L).collect().map(_.getLong(0)).toSet
    other.size shouldBe 30
  }

  test("microNats: floor(x*1e6 + 0.5) quantization on both signs") {
    Sampling.microNats(3.0) shouldBe 3000000L
    Sampling.microNats(-3.0) shouldBe -3000000L
    Sampling.microNats(0.0) shouldBe 0L
    Sampling.microNats(1.23456789) shouldBe 1234568L   // .89 → up
    Sampling.microNats(-1.23456789) shouldBe -1234568L // floor(-….39)
  }

  test("selection plans as TakeOrderedAndProject (bounded heaps, no global sort)") {
    val plan = Sampling.importanceResample(raw, target, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("ratio store: fit-once scores a NEW batch identically to an in-flight fit") {
    val store = java.nio.file.Files.createTempDirectory("dsir-").resolve("ratios")
    Sampling.saveImportanceRatios(raw, target, "doc_id", "text", store.toString)
    val ratios = Sampling.readImportanceRatios(spark, store.toString)
    // same-batch identity: store path ≡ in-flight path, bit-for-bit
    val fromStore = Sampling.importanceWeightsFromStore(raw, ratios, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inFlight = Sampling.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    fromStore shouldBe inFlight
    // a batch unseen at fit time scores against the FROZEN fit: its
    // science docs still outscore its spam docs
    val day2 = (flavored(5, sci, 9000) ++ flavored(5, spam, 9500))
      .toDF("doc_id", "text")
    val w2 = Sampling.importanceWeightsFromStore(day2, ratios, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 5).map(i => w2(9000L + i)).min should be >
      (0 until 5).map(i => w2(9500L + i)).max
  }

  test("empty-token documents contribute nothing; buckets unseen in raw are inert") {
    val rawE = Seq((1L, "atom cell"), (2L, "   ")).toDF("doc_id", "text")
    val out = Sampling.importanceWeights(rawE, Seq((9L, "atom")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    // doc 2 tokenizes to nothing → no row (no tokens to score)
    out.map(_.getLong(0)).toSet shouldBe Set(1L)
  }
}
