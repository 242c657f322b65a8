package graft.operators

import graft.SparkSpec

/** PII scrub: detection counts, redaction output, category interplay
  * (an IP-domain "email" must NOT match as email), and the shuffle-free
  * plan shape.
  */
class PiiRedactSpec extends SparkSpec {

  import spark.implicits._

  test("counts and redaction on a mixed-PII document") {
    val df = Seq(
      (1L, "write a@b.io or c.d+x@e.org, host 10.0.0.1, call +44 123 4567 now"),
      (2L, "clean text with math 1+2 and version 1.2.3 only"),
      (3L, "ip-as-domain user@10.0.0.1 stays an IP, not an email")
    ).toDF("id", "text")
    val out = PiiRedact.withRedaction(df, "text")
      .select("id", "n_emails", "n_ipv4", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    out(1L) shouldBe ((2L, 1L, 1L,
      "write <EMAIL> or <EMAIL>, host <IP>, call <PHONE> now"))
    out(2L) shouldBe ((0L, 0L, 0L,
      "clean text with math 1+2 and version 1.2.3 only"))
    // the local part is eaten by the IP match's word boundary rules:
    // no email, one IP
    out(3L)._1 shouldBe 0L
    out(3L)._2 shouldBe 1L
    out(3L)._4 should include("<IP>")
    out(3L)._4 should not include "<EMAIL>"
  }

  test("redaction is a pure map-side projection: no Exchange") {
    val df = Seq((1L, "a@b.io")).toDF("id", "text")
    PiiRedact.withRedaction(df, "text")
      .queryExecution.executedPlan.toString should not include "Exchange"
  }
}
