package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl curation: canonical URL forms (so the exact
  * dedup key actually collides for the same page), registrable-domain
  * extraction (the unit of crawl policy: blocklists, per-domain caps,
  * mixture weights), and domain filtering.
  *
  * All pure Column algebra over `regexp_extract`/`split`/array ops —
  * codegen'd, no UDFs, narrow (zero shuffles until the caller
  * aggregates).
  */
object Web {

  private val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val hostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"

  /** Tracking parameters stripped during normalization (the ad-tech set
    * every crawl pipeline drops: they never change page content). */
  val trackingParams: Seq[String] =
    Seq("utm_source", "utm_medium", "utm_campaign", "utm_term",
      "utm_content", "gclid", "fbclid", "msclkid", "ref")

  /** Canonical form: lowercase scheme and host, strip a leading `www.`,
    * drop default ports (:80 http, :443 https), drop the fragment, drop
    * tracking query parameters, sort surviving parameters (query order is
    * not semantic), and trim a trailing `/` from non-root paths. Two URLs
    * for the same page normalize to the same string — the precondition
    * for URL-level exact dedup.
    *
    * Scheme-less inputs (bare hosts, protocol-relative refs) pass through
    * unchanged: without `scheme://` the authority regexes extract nothing
    * and the rewrite would degenerate to `"://" + input`. Best-effort
    * canonicalization keeps the raw string as its own dedup key instead
    * (use [[registeredDomain]] for bare hosts — it handles them). */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val hostPort = lower(regexp_extract(url, hostRe, 1))
    val host0 = regexp_replace(hostPort, ":\\d+$", "")
    val host = regexp_replace(host0, "^www\\.", "")
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val keepPort = when(
      port === "" || (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    // path?query#fragment = everything after the authority
    val rest = regexp_replace(url, hostRe, "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path0 = regexp_replace(noFrag, "\\?.*$", "")
    val path = when(path0 === "" , lit(""))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val tracked = trackingParams.map(p => lit(p)).toArray
    val params = array_sort(filter(split(query, "&"), kv =>
      kv =!= "" && !array_contains(
        array(tracked.toIndexedSeq: _*),
        lower(element_at(split(kv, "=", 2), 1)))))
    val q = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(url.rlike(schemeRe),
      concat(scheme, lit("://"), host, keepPort, path, q))
      .otherwise(url)
  }

  /** Multi-label public suffixes where the registrable domain is THREE
    * labels (a small static core of the public-suffix list; a production
    * deployment swaps in the full PSL snapshot the same way). */
  val multiLabelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp", "com.au",
      "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in", "co.kr",
      "com.sg", "com.tr")

  /** Registrable domain of a URL or bare hostname: the last two labels,
    * or the last three when the two-label tail is a known public suffix
    * (`example.co.uk` → `example.co.uk`, not `co.uk`). */
  def registeredDomain(url: Column): Column = {
    // scheme-less inputs (bare hosts, protocol-relative refs) must still
    // truncate the authority at the first /?# — otherwise a path rides
    // into the label split ("example.com/page" → last label "com/page")
    // and blocklist matches silently fail; userinfo is stripped for the
    // same reason ("trusted.com@evil.com" must resolve to evil.com)
    val hostPort = when(url.rlike(schemeRe),
      regexp_extract(url, hostRe, 1))
      .otherwise(regexp_replace(regexp_replace(url, "^//", ""),
        "[/?#].*$", ""))
    val noUser = regexp_replace(hostPort, "^[^/?#]*@", "")
    val host = regexp_replace(lower(noUser), ":\\d+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    val suffixes = array(multiLabelSuffixes.map(lit).toIndexedSeq: _*)
    when(n <= 2, host)
      .when(array_contains(suffixes, last2), last3)
      .otherwise(last2)
  }

  /** HTML → text extraction (the curation step before any text analysis
    * of crawled pages): drop script/style payloads and comments, strip
    * tags, decode the common entities, collapse whitespace. Pure
    * codegen'd regex algebra — narrow, shuffle-free. RE2-compatible
    * patterns (no backreferences, non-greedy only), so the DuckDB oracle
    * runs the identical pipeline. A production deployment swaps in a
    * full parser the same way (e.g. jsoup behind this signature); the
    * regex tier is the cheap first pass that handles the overwhelming
    * share of crawl HTML. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)</?[a-zA-Z][^>]*>", " ")
    // literal entity decode; &amp; LAST so "&amp;lt;" yields "&lt;", not "<"
    val decoded = Seq(
      ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
      ("&#39;", "'"), ("&amp;", "&"))
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Drop rows whose registrable domain is on the blocklist. The
    * blocklist is a DataFrame (it can be millions of rows — an anti join,
    * which AQE turns into a broadcast when it is small), not an in-memory
    * list. */
  def filterBlockedDomains(docs: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    val withDomain = docs.withColumn("__dom", registeredDomain(col(urlCol)))
    withDomain.join(
      blocklist.select(lower(col(domainCol)).as("__dom")).distinct(),
      Seq("__dom"), "left_anti")
      .drop("__dom")
  }
}
