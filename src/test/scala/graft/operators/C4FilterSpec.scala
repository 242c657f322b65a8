package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 line rules (kernel) + document rules (composition): each rule in
  * isolation, trim semantics pinned to the SQL oracle's, and the
  * map-side plan.
  */
class C4FilterSpec extends SparkSpec {

  import spark.implicits._

  private def keep(text: String, minWords: Int = 3): String =
    Seq(text).toDF("t")
      .select(TextAnalysis.c4KeepLines(col("t"), minWords))
      .collect()(0).getString(0)

  test("line rules: terminal punctuation, min words, javascript") {
    keep("A proper sentence line.") shouldBe "A proper sentence line."
    keep("ends with bang!") shouldBe "ends with bang!"
    keep("ends with question?") shouldBe "ends with question?"
    keep("ends with quote.\"") shouldBe "ends with quote.\""
    keep("no terminal punctuation here") shouldBe ""
    keep("short.") shouldBe ""                  // 1 word < 3
    keep("two words.") shouldBe ""              // 2 words < 3
    keep("two words.", minWords = 2) shouldBe "two words."
    keep("enable JavaScript to continue.") shouldBe ""
  }

  test("multi-line: survivors keep order, losers vanish, lines trimmed") {
    keep("First good line here.\nbad\n  Second good line here!  \nshort.") shouldBe
      "First good line here.\nSecond good line here!"
    keep("nothing survives\nat all") shouldBe ""
  }

  test("trim is space-only (SQL trim semantics, not Java trim)") {
    // a tab-leading line space-trims to a string that still starts with
    // \t → \s+ split yields a leading empty token in both engines; with
    // 3 real words + the empty token the count is 4 either way
    keep("\tthree real words here.") shouldBe "\tthree real words here."
  }

  test("null text stays null") {
    val r = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(TextAnalysis.c4KeepLines(col("t"), 3)).collect()(0)
    r.isNullAt(0) shouldBe true
  }

  test("document rules: minLines, lorem ipsum, curly brace on ORIGINAL text") {
    val docs = Seq(
      (1L, "Good line number one here.\nGood line number two here.\nGood line number three here."),
      (2L, "Good line number one here.\nGood line number two here."),
      (3L, "Good line number one here.\nGood line number two here.\nGood line number three here.\nLorem IPSUM filler."),
      // the brace sits on a line the line-filter would drop — the page
      // must die anyway (C4 judges code markers on the raw page)
      (4L, "Good line number one here.\nGood line number two here.\nGood line number three here.\nvar x = { broken")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(docs, "doc_id", "text").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L)
    out(0).getLong(1) shouldBe 3L
  }

  test("kernel + doc filter is map-side: no Exchange in the plan") {
    val df = TextAnalysis.c4LineFilter(
      Seq((1L, "a.")).toDF("doc_id", "text"), "doc_id", "text")
    df.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("lineSignals: fractions over non-empty trimmed lines") {
    val text = "A normal line\nContinued...\n- bullet one\n* bullet two\n" +
      "dup line\ndup line\n   \n"
    val r = TextAnalysis.lineSignals(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    r.getLong(1) shouldBe 6L                      // blank line excluded
    r.getDouble(2) shouldBe (1.0 / 6) +- 1e-12    // one ellipsis line
    r.getDouble(3) shouldBe (2.0 / 6) +- 1e-12    // two bullet lines
    // dup chars: "dup line" (8) × 2 = 16 of 13+12+12+12+16 = 65
    r.getDouble(4) shouldBe (16.0 / 65) +- 1e-12
  }

  test("lineSignals: doc with only blank lines yields no row; counts duplicate mass once per doc") {
    val out = TextAnalysis.lineSignals(Seq(
      (1L, "  \n \n"),
      (2L, "same\nsame\nsame\nother")
    ).toDF("doc_id", "text"), "doc_id", "text").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L)
    out(0).getLong(1) shouldBe 4L
    out(0).getDouble(4) shouldBe (12.0 / 17) +- 1e-12 // 3×4 dup chars of 17
  }
}
