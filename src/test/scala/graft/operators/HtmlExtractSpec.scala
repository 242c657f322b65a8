package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML → text extraction: each strip/decode rule, their composition,
  * line-structure preservation, and the map-side (no-Exchange) plan.
  */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private def extract(h: String): String =
    Seq(h).toDF("h").select(HtmlExtract.htmlToText(col("h"))).collect()(0).getString(0)

  private def title(h: String): String =
    Seq(h).toDF("h").select(HtmlExtract.htmlTitle(col("h"))).collect()(0).getString(0)

  test("plain text passes through untouched") {
    extract("just words, no markup.") shouldBe "just words, no markup."
  }

  test("script and style bodies are removed content-and-all") {
    extract("a<script>var x = '<p>not prose</p>';</script>b") shouldBe "ab"
    extract("a<style>p { color: red; }</style>b") shouldBe "ab"
    // case-insensitive, attributes on the open tag, > inside the body
    extract("a<SCRIPT type=\"text/javascript\">if (1 > 0) {}</SCRIPT>b") shouldBe "ab"
  }

  test("comments are removed, including multi-line") {
    extract("a<!-- one -->b") shouldBe "ab"
    extract("a<!-- line1\nline2 -->b") shouldBe "ab"
  }

  test("block-closing tags become line boundaries; inline tags vanish") {
    extract("<p>first para</p><p>second para</p>") shouldBe
      "first para\nsecond para"
    extract("one<br>two<br/>three") shouldBe "one\ntwo\nthree"
    extract("<b>bold</b> and <i>italic</i> stay inline") shouldBe
      "bold and italic stay inline"
    extract("<h1>Head</h1>body") shouldBe "Head\nbody"
  }

  test("entities decode once, &amp; last") {
    extract("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp; done") shouldBe
      "x <tag> \"q\" 's' a b & done"
    // double-encoded: the author wrote the literal text '&lt;' — decoding
    // must NOT cascade it to '<'
    extract("&amp;lt;") shouldBe "&lt;"
  }

  test("whitespace collapses: runs, line-edge spaces, blank lines") {
    extract("a   b\t\tc") shouldBe "a b c"
    extract("<p>  padded  </p><p></p><p>next</p>") shouldBe "padded\nnext"
  }

  test("title extraction decodes entities and collapses whitespace") {
    title("<html><head><title> A &amp;  B </title></head></html>") shouldBe "A & B"
    title("<html><body>no title</body></html>") shouldBe ""
  }

  test("full document composes all rules") {
    val html =
      """<html><head><title>T &#39;1&#39;</title><style>p{}</style>
        |<script>var n = 1; if (n > 0) { n--; }</script></head>
        |<body><!-- c --><h1>H</h1><p>body &amp; soul</p>
        |<div class="x">tail&nbsp;&lt;kept&gt;</div></body></html>""".stripMargin
    title(html) shouldBe "T '1'"
    extract(html) shouldBe "H\nbody & soul\ntail <kept>"
  }

  test("extraction is a map-side projection: no Exchange in the plan") {
    val df = Seq(("<p>a</p>", 1L)).toDF("h", "id")
      .select(col("id"), HtmlExtract.htmlToText(col("h")).as("t"),
        HtmlExtract.htmlTitle(col("h")).as("ti"))
    df.queryExecution.executedPlan.toString should not include "Exchange"
  }
}
