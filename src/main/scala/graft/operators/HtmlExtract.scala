package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first pass of every web-crawl training
  * pipeline (WET-style text extraction): crawl archives hold raw HTML,
  * and all downstream curation (quality filters, dedup, tokenization)
  * operates on the extracted prose.
  *
  * The whole extraction is a chain of scalar `regexp_replace` steps —
  * codegen'd, map-side, shuffle-free, scan-speed at 100 TB — and every
  * regex stays inside the Java∩RE2 intersection ((?i)/(?s) flags,
  * non-greedy `.*?`, `\b`, bounded classes; no backrefs or lookaround)
  * so the DuckDB oracle replays the chain byte-for-byte.
  *
  * Steps:
  *   1. drop comments, the `<head>` block (title/meta/link — the title
  *      is surfaced separately by [[htmlTitle]], not mixed into body
  *      prose), and `<script>`/`<style>` blocks anywhere (content and
  *      all — their bodies are code, not prose),
  *   2. block-level boundaries (`<br>`, closing `p/div/li/h1-6/tr/
  *      table/ul/ol/blockquote`) become newlines so line structure
  *      survives for line-level filters ([[TextAnalysis]] C4 rules),
  *   3. strip every remaining tag,
  *   4. decode the six entities that dominate real markup (`&lt; &gt;
  *      &quot; &#39; &nbsp; &amp;` — `&amp;` LAST, so `&amp;lt;`
  *      decodes to the literal `&lt;` the author wrote, not `<`),
  *   5. collapse horizontal whitespace, trim line ends, collapse blank
  *      lines, trim the document.
  *
  * Nearest reference analog: none (SURVEY.md §2.6 — the reference
  * ingests structured rows, not crawl HTML); beyond-reference
  * scale-extension surface alongside UrlOps/TextAnalysis.
  */
object HtmlExtract {

  /** Tags whose closing edge ends a visual block. */
  private val BlockCloseRe =
    "(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)\\b[^>]*>"

  /** Extracted body text of an HTML document, newline-structured. */
  def htmlToText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", "")
    // \b keeps <header> (a body landmark) out of the match
    val noHead    = regexp_replace(noComment, "(?is)<head\\b.*?</head>", "")
    val noScript  = regexp_replace(noHead, "(?is)<script\\b.*?</script>", "")
    val noStyle   = regexp_replace(noScript, "(?is)<style\\b.*?</style>", "")
    val blocked   = regexp_replace(noStyle, BlockCloseRe, "\n")
    val untagged  = regexp_replace(blocked, "<[^>]*>", "")
    val decoded   = decodeEntities(untagged)
    val oneSpace  = regexp_replace(decoded, "[ \\t]+", " ")
    val trimmedNl = regexp_replace(oneSpace, " ?\n ?", "\n")
    val oneNl     = regexp_replace(trimmedNl, "\n\n+", "\n")
    // SQL trim strips spaces only — document-edge newlines need the regex
    trim(regexp_replace(oneNl, "^\n+|\n+$", ""))
  }

  /** `<title>` content (entity-decoded, whitespace-collapsed), or empty
    * when the document has none.
    */
  def htmlTitle(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)),
      "\\s+", " "))

  /** The six entities worth decoding without an entity table; `&amp;`
    * must come last (double-encoded entities decode one level only).
    */
  private def decodeEntities(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(c,
        "&lt;", "<"),
        "&gt;", ">"),
        "&quot;", "\""),
        "&#39;", "'"),
        "&nbsp;", " "),
        "&amp;", "&")
}
