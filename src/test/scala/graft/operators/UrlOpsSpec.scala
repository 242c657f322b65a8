package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization: each normalization rule, their composition,
  * path case preservation, and the dedup verdict.
  */
class UrlOpsSpec extends SparkSpec {

  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(UrlOps.normalizeUrl(col("u"))).collect()(0).getString(0)

  test("normalization rules, individually and composed") {
    norm("HTTPS://WWW.Example.COM/Path") shouldBe "https://www.example.com/Path"
    norm("https://example.com:443/a") shouldBe "https://example.com/a"
    norm("http://example.com:80/a") shouldBe "http://example.com/a"
    norm("http://example.com:8080/a") shouldBe "http://example.com:8080/a"
    norm("https://example.com/a/") shouldBe "https://example.com/a"
    norm("https://example.com/a#section-2") shouldBe "https://example.com/a"
    norm("https://example.com/a?utm_source=x&id=5") shouldBe
      "https://example.com/a?id=5"
    norm("https://example.com/a?id=5&utm_campaign=y&fbclid=z") shouldBe
      "https://example.com/a?id=5"
    norm("https://example.com/a?utm_source=x") shouldBe "https://example.com/a"
    // everything at once; path case preserved, host case folded
    norm("HTTPS://Host.COM:443/A/B/?utm_source=f&gclid=g&q=1#frag") shouldBe
      "https://host.com/A/B/?q=1"
  }

  test("params whose names merely CONTAIN a tracking name survive intact") {
    // 'href' contains 'ref', 'xref' ends with 'ref' — without the [?&]
    // anchor these were mangled to '?h' / '?x', collapsing distinct URLs
    // to one norm_url and dropping real documents as non-canonical
    norm("https://example.com/a?href=b") shouldBe "https://example.com/a?href=b"
    norm("https://example.com/a?xref=1") shouldBe "https://example.com/a?xref=1"
    norm("https://example.com/a?pref=1&utm_x=2") shouldBe
      "https://example.com/a?pref=1"
    // the genuine bare 'ref' param is still stripped in both positions
    norm("https://example.com/a?ref=feed") shouldBe "https://example.com/a"
    norm("https://example.com/a?id=1&ref=feed") shouldBe
      "https://example.com/a?id=1"
    // consecutive tracking params collapse cleanly
    norm("https://example.com/a?utm_a=1&utm_b=2&q=3") shouldBe
      "https://example.com/a?q=3"
  }

  test("dedupByUrl: canonical is the min id per normalized URL") {
    val df = Seq(
      (1L, "https://a.com/x?utm_source=f"),
      (2L, "HTTPS://A.COM/x"),
      (3L, "https://a.com/y")
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(df, "doc_id", "url")
      .select("doc_id", "norm_url", "keep_id", "is_canonical")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe (("https://a.com/x", 1L, true))
    out(2L) shouldBe (("https://a.com/x", 1L, false))
    out(3L) shouldBe (("https://a.com/y", 3L, true))
  }

  test("domain: lowercased host, port and www. stripped") {
    import spark.implicits._
    val out = Seq(
      "HTTPS://WWW.Example.COM:443/a?b=1",
      "http://sub.Example.com/x",
      "https://example.com#f"
    ).toDF("u").select(UrlOps.domain($"u")).as[String].collect()
    out shouldBe Array("example.com", "sub.example.com", "example.com")
  }

  test("filterBlockedDomains drops blocked domains and their subdomains only") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://bad.net/x"),
      (2L, "https://sub.bad.net/y"),       // subdomain → dropped
      (3L, "https://notbad.net/z"),        // suffix-similar host → KEPT
      (4L, "https://good.org/w"),
      (5L, "HTTP://WWW.Bad.NET:80/v")      // case/port/www variants → dropped
    ).toDF("id", "url")
    UrlOps.filterBlockedDomains(df, "url", Seq("bad.net"))
      .select("id").as[Long].collect().sorted shouldBe Array(3L, 4L)
  }

  test("capPerDomain: at most maxDocs per domain, deterministic, domain column added") {
    import spark.implicits._
    val df = (1L to 30L).map { i =>
      val host = if (i <= 20) "big.com" else if (i <= 27) "mid.org" else "tiny.io"
      (i, s"https://$host/p/$i")
    }.toDF("id", "url")
    val out = UrlOps.capPerDomain(df, "id", "url", maxDocs = 5)
    out.columns.toSeq shouldBe Seq("id", "url", "domain")
    val byDomain = out.collect().groupBy(_.getString(2)).view.mapValues(_.length).toMap
    byDomain shouldBe Map("big.com" -> 5, "mid.org" -> 5, "tiny.io" -> 3)
    // deterministic rerun → identical kept set
    out.collect().map(_.getLong(0)).toSet shouldBe
      UrlOps.capPerDomain(df, "id", "url", 5).collect().map(_.getLong(0)).toSet
  }

  test("filterBlockedDomains keeps null-URL rows (not on the blocklist)") {
    import spark.implicits._
    // pre-fix, `bad` evaluated to null for a null URL and filter(!bad)
    // silently dropped the row
    val df = Seq(
      (1L, "https://bad.net/x"),
      (2L, null.asInstanceOf[String]),
      (3L, "https://ok.org/")
    ).toDF("id", "url")
    UrlOps.filterBlockedDomains(df, "url", Seq("bad.net"))
      .select("id").as[Long].collect().sorted shouldBe Array(2L, 3L)
  }
}
