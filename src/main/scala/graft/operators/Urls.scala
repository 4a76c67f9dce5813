package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — the web-corpus
  * dedup keys (CommonCrawl-scale pipelines dedupe by canonical URL
  * before any content hashing, and cap per registered domain so one
  * crawler-friendly site can't dominate the mixture).
  *
  * Pure codegen'd column math in the Java-regex ∩ RE2 portable subset —
  * map-only at any scale, oracle-checkable verbatim. Canonicalization
  * applies the safe, semantics-preserving subset of RFC 3986 §6 plus
  * the standard crawl conventions:
  *   - scheme and host lowercase (case-insensitive per RFC)
  *   - fragment dropped (never sent to the server)
  *   - default port stripped (`:80` for http, `:443` for https)
  *   - leading `www.` dropped (crawl convention, not RFC)
  *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`)
  *   - empty path → `/`, dangling `?`/`&` tidied
  *
  * Registered domain = last two host labels, or last three when the
  * second-to-last is a well-known second-level suffix (`co.uk`-style).
  * The embedded suffix set is a small public sample — production swaps
  * in the full Mozilla Public Suffix List through the same seam. */
object Urls {

  /** Second-level labels that combine with a country TLD to form a
    * public suffix (sample of the Mozilla PSL's most common entries). */
  val SecondLevelSuffixes: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  private val schemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://.*$"
  private val hostPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+).*$"
  private val restPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$"

  /** Lowercased scheme of an absolute URL ('' when not URL-shaped). */
  def scheme(url: Column): Column = lower(regexp_extract(url, schemePat, 1))

  /** Lowercased host WITHOUT port, `www.` stripped. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, hostPat, 1)), ":[0-9]+$", ""),
      "^www\\.", "")

  /** Canonical form; null input stays null, non-URL strings canonicalize
    * to '://' noise the caller can filter on `scheme != ''`. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val hostPort = lower(regexp_extract(url, hostPat, 1))
    // strip the scheme's default port only (a non-default port is
    // load-bearing); then the www. crawl convention
    val h0 = when(sch === "http", regexp_replace(hostPort, ":80$", ""))
      .when(sch === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val h = regexp_replace(h0, "^www\\.", "")
    // path?query with the fragment dropped, tracking params removed,
    // separators re-tidied ('?&' -> '?', trailing '?'/'&' dropped)
    val rest0 = regexp_replace(regexp_extract(url, restPat, 1), "#.*$", "")
    val rest1 = regexp_replace(rest0,
      "(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*&?", "")
    val rest2 = regexp_replace(regexp_replace(rest1, "\\?&", "?"),
      "[?&]+$", "")
    val rest = when(rest2 === "", lit("/")).otherwise(rest2)
    concat(sch, lit("://"), h, rest)
  }

  /** Registered domain of a host column (NOT a full URL): last two
    * labels, or three when label n-1 is a known second-level suffix and
    * the host has >= 3 labels. IPs and single-label hosts pass through
    * unchanged. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val secondLast = element_at(labels, -2)
    val take3 = n >= 3 &&
      secondLast.isInCollection(SecondLevelSuffixes) &&
      // an all-digit host is an IPv4 literal, never a domain
      !hostCol.rlike("^[0-9.]+$")
    when(n <= 1 || hostCol.rlike("^[0-9.]+$"), hostCol)
      .when(take3, concat_ws(".", element_at(labels, -3),
        element_at(labels, -2), element_at(labels, -1)))
      .otherwise(concat_ws(".", element_at(labels, -2),
        element_at(labels, -1)))
  }
}
