package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The fused gopher+entropy gate must be BIT-IDENTICAL to the sequential
  * stages while sharing one token pass (fewer exchanges) — the priced
  * claim behind the curation block's adjacent-pair fusion.
  */
class GopherEntropyFusionSpec extends SparkSpec {
  import spark.implicits._

  // a corpus spanning the interesting regimes: clean prose, too-short,
  // repetitive, tokenless, punctuation-heavy
  private def corpus = {
    val prose = (1 to 80).map(i => s"w${i * 7919 % 997}").mkString(" ") + "."
    val prose2 = (1 to 200).map(i => s"t${i * 31 % 611} and").mkString(" ")
    Seq(
      (1L, prose),
      (2L, prose2),
      (3L, "too short"),
      (4L, ("spam " * 100).trim),
      (5L, ""),
      (6L, "!!! ??? ... " * 40),
      (7L, (1 to 45).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
  }

  private def sequential(minNats: Double): DataFrame =
    TextAnalysis.entropyFilter(
      TextAnalysis.gopherQualityFilter(corpus, "doc_id", "text"),
      "doc_id", "text", minNats)

  private def fused(minNats: Double): DataFrame =
    TextAnalysis.gopherEntropyFilter(corpus, "doc_id", "text", minNats)

  test("fused gate ≡ sequential gopher→entropy, across thresholds") {
    for (minNats <- Seq(0.5, 1.0, 3.0, 10.0)) {
      val s = sequential(minNats).collect().map(_.getLong(0)).sorted
      val f = fused(minNats).collect().map(_.getLong(0)).sorted
      withClue(s"minNats=$minNats: ") { f shouldBe s }
    }
  }

  test("both gate forms are shuffle-free map-side filters (r21 kernel)") {
    // r21: the per-row WordRepetitionStats kernel made BOTH forms
    // exchange-free scan-speed filters (the fusion used to save the
    // second token pass; now there is no token pass to save — the spec
    // pins that neither form regresses back to a shuffle)
    def exchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    withClue("fused: ") { exchanges(fused(1.0)) shouldBe 0 }
    withClue("sequential: ") { exchanges(sequential(1.0)) shouldBe 0 }
  }

  test("curation block fuses ADJACENT [gopher, entropy] with identical results") {
    val viaList = graft.JobRunner.applyCuration(corpus,
      Map("curation" -> Map(
        "id_field" -> "doc_id", "text_field" -> "text",
        "quality_filter" -> Seq("gopher", "entropy"),
        "entropy_min_nats" -> "1.0")))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    viaList shouldBe sequential(1.0).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    // reversed adjacency fuses too (per-doc predicates commute)
    val reversed = graft.JobRunner.applyCuration(corpus,
      Map("curation" -> Map(
        "id_field" -> "doc_id", "text_field" -> "text",
        "quality_filter" -> Seq("entropy", "gopher"),
        "entropy_min_nats" -> "1.0")))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    reversed shouldBe viaList
  }
}
