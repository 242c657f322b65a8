package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — training corpora are routinely scanned for emails,
  * IP addresses, and phone numbers, which are either counted (to score
  * documents for filtering) or replaced with placeholder tokens before
  * the text reaches a tokenizer.
  *
  * Everything here is plain `regexp_count`/`regexp_replace` Column
  * expressions: per-row, codegen'd, shuffle-free — at 100 TB the scrub
  * runs at scan speed map-side, exactly like the quality signals in
  * [[TextAnalysis]]. The patterns deliberately stay inside the regex
  * subset Java and RE2 agree on (no lookarounds, no backrefs), so the
  * DuckDB oracle replays detection AND redaction byte-for-byte.
  *
  * Nearest reference analog: none (SURVEY.md §2.6) — scale-extension
  * surface alongside [[TextAnalysis]].
  */
object PiiRedact {

  /** user@host.tld — the domain must end in an alphabetic TLD, which is
    * also what keeps `user@10.0.0.1` from double-matching as an email.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like `1.2.3.4a`
    * don't partially match.
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-prefix phone: +CC then 3-then-4 digit groups with
    * space or dash separators. Conservative on purpose — a looser
    * pattern starts eating arithmetic in code corpora.
    */
  val PhoneRe = "\\+\\d{1,3}[ -]\\d{3}[ -]\\d{4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe)).cast("long")

  /** All three scrubs chained; emails first so their digit-bearing local
    * parts are gone before the looser numeric patterns run.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII report: counts per category plus the scrubbed
    * text, in one map-side pass.
    */
  def withRedaction(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", emailCount(col(textCol)))
      .withColumn("n_ipv4", ipv4Count(col(textCol)))
      .withColumn("n_phones", phoneCount(col(textCol)))
      .withColumn("redacted", redact(col(textCol)))
}
