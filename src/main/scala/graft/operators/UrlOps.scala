package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — web-corpus curation dedups documents by
  * normalized URL before any content pass (same page crawled via
  * tracking links, mixed-case hosts, default ports, trailing slashes).
  *
  * Normalization steps, all pure `regexp_*` scalar expressions
  * (codegen'd, shuffle-free, and inside the Java∩RE2 regex subset so
  * the DuckDB oracle replays them exactly):
  *   1. drop the fragment (`#…`),
  *   2. strip tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`),
  *      collapsing the separators they leave behind,
  *   3. lowercase scheme+host (paths stay case-sensitive per RFC 3986)
  *      and drop the default `:80`/`:443` port,
  *   4. strip a trailing slash.
  *
  * Dedup-by-URL then composes with [[Dedup.dropExactDuplicates]]-style
  * keep-min grouping on the normalized column.
  */
object UrlOps {

  /** Query parameters that identify a campaign, not a resource. */
  val TrackingParamRe = "(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)"

  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // the [?&] anchor before the param name is load-bearing: without it
    // any param whose name merely ENDS with a tracking name is mangled
    // ('?href=a' contains 'ref=a' → '?h'), collapsing distinct URLs to
    // one norm_url and dropping real documents as non-canonical. The
    // captured separator is kept so the collapse step sees it.
    val noTrack = regexp_replace(noFrag, "([?&])" + TrackingParamRe + "=[^&]*", "$1")
    val collapsed = regexp_replace(
      regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    val noDangle = regexp_replace(collapsed, "[?&]+$", "")
    val host = regexp_replace(
      lower(regexp_extract(noDangle, HostRe, 0)), ":(80|443)$", "")
    val rest = regexp_replace(noDangle, HostRe, "")
    regexp_replace(concat(host, rest), "/$", "")
  }

  /** Registrable host of a URL: lowercased, port stripped, leading
    * `www.` stripped — the key a domain blocklist matches on.
    */
  def domain(u: Column): Column = {
    val host = regexp_extract(lower(u), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)
    regexp_replace(host, "^www\\.", "")
  }

  /** Domain-blocklist filter — the C4-style source exclusion step: drop
    * rows whose URL's domain IS a blocked domain or any subdomain of
    * one. The blocklist chains into one codegen'd boolean (driver
    * literals), so the filter is map-side and shuffle-free; for a
    * blocklist too large to inline (millions of domains), switch to a
    * broadcast anti-join on the [[domain]] column — same semantics.
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    val d = domain(col(urlCol))
    val bad = blocked.map(_.toLowerCase).map(b =>
      d === lit(b) || d.endsWith(lit("." + b)))
      .reduceOption(_ || _).getOrElse(lit(false))
    // null-URL rows: `bad` evaluates to null and a bare filter(!bad)
    // would silently drop them even though their domain is not on the
    // blocklist — keep them explicitly (drop only what IS blocked)
    df.filter(coalesce(!bad, lit(true)))
  }

  /** Per-domain document quota — the anti-domination curation step: a
    * handful of mega-domains otherwise contribute an outsized share of
    * a crawl corpus, and mixture work (RefinedWeb, FineWeb) caps
    * documents per registrable domain before any content pass. The kept
    * set per domain is a deterministic uniform without-replacement draw
    * (first `maxDocs` in md5-key order via
    * [[Sampling.stratifiedSample]]), so reruns and engines agree on the
    * exact survivors. Scale shape: per-partition bounded heaps pre-prune
    * to ~partitions×maxDocs rows per domain, then ONE window shuffle on
    * the domain key; adds a `domain` column to the output.
    */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String,
      maxDocs: Int): DataFrame =
    Sampling.stratifiedSample(
      df.withColumn("domain", domain(col(urlCol))), "domain", idCol, maxDocs)

  /** Per-row normalized column plus the canonical-first verdict: the
    * minimum id per normalized URL is the keeper. One shuffle on the
    * (narrow) normalized-URL key.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val normed = df.withColumn("norm_url", normalizeUrl(col(urlCol)))
    normed.withColumn("keep_id",
      min(col(idCol)).over(Window.partitionBy(col("norm_url"))))
      .withColumn("is_canonical", col(idCol) === col("keep_id"))
  }
}
