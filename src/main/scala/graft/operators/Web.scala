package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web/URL curation operators — the front half of a crawl-derived training
  * pipeline (C4 / RefinedWeb style): parse URLs into their components, reduce
  * them to a canonical form, and fold documents that differ only by tracking
  * noise onto one representative.
  *
  * Everything here is a pure `Column` expression, no UDF, no shuffle of its
  * own: the parse/registered-domain family is regexp-only (whole-stage
  * codegen'd); the canonicalizer's query-param step uses higher-order array
  * functions whose lambdas evaluate interpreted per element — fine here
  * because a URL carries ≤ a handful of params (unlike the per-shingle HOF
  * trap SCALE.md documents for the dedup family). The only exchange in a
  * URL-dedup pipeline is the hash aggregation on the canonical key, which
  * is exactly the exact-dedup shape ([[Dedup.exactByKey]]).
  * At 100 TB the canonical key is a short string — the shuffle carries the key
  * and the keep-policy payload, never the document body.
  *
  * Cross-engine notes (the DuckDB oracle replays the same logic): every regex
  * sticks to the RE2-compatible subset (no lookaround, no backrefs) so Java
  * regex (Spark) and RE2 (DuckDB) agree; array sorting is binary-order over
  * ASCII parameter strings, identical in both engines.
  *
  * Reference scope: omegaml/minibatch has no URL handling — this is part of
  * the [EXT] LLM-data-pipeline surface the north star requires.
  */
object Web {

  /** URL split pattern. Groups: 1=scheme, 2=host, 3=:port, 4=path, 5=?query,
    * 6=#fragment. RE2-safe (plain groups/classes only).
    */
  val UrlPattern: String =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Multi-part public suffixes recognised by [[registeredDomain]]. A small
    * embedded subset of the public-suffix list (publicsuffix.org) — the
    * full list swaps in as a broadcast lookup without changing the logic.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "com.tw", "com.sg",
    "co.in", "co.kr", "co.za")

  /** Lower-cased scheme, or null when `url` is not a well-formed absolute URL. */
  def scheme(url: Column): Column =
    lower(nullif(regexp_extract(url, UrlPattern, 1), lit("")))

  /** Lower-cased host (port excluded), or null when unparseable. */
  def host(url: Column): Column =
    lower(nullif(regexp_extract(url, UrlPattern, 2), lit("")))

  /** Explicit port as an int, or null when the URL carries none. */
  def port(url: Column): Column =
    nullif(regexp_extract(url, UrlPattern, 3), lit(""))
      .substr(lit(2), lit(5)).cast("int")

  /** Path component ('' when absent — normalisation to '/' is the
    * canonicalizer's job, parsing reports what is there).
    */
  def path(url: Column): Column = regexp_extract(url, UrlPattern, 4)

  /** Query string without the leading '?', or null when absent. */
  def queryString(url: Column): Column =
    nullif(regexp_extract(url, UrlPattern, 5), lit("")).substr(lit(2), lit(4096))

  /** Registered domain (eTLD+1) of a lower-cased host: last two labels,
    * or last three when the trailing two labels form a known multi-part
    * public suffix (`site.co.uk` → `site.co.uk`, not `co.uk`). Single-label
    * hosts pass through unchanged.
    */
  def registeredDomain(hostL: Column): Column = {
    val last2 = regexp_extract(hostL, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(hostL, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val suffix2 = regexp_extract(hostL, "[^.]+\\.([^.]+\\.[^.]+)$", 1)
    when(last2 === "", hostL)
      .when(suffix2.isin(MultiPartSuffixes: _*) && last3 =!= "", last3)
      .otherwise(last2)
  }

  /** Query parameters stripped by [[canonicalizeUrl]] — the tracking noise
    * that makes one page look like many distinct URLs. RE2-safe prefix match.
    */
  val TrackingParamPattern: String = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** Canonical form of an absolute URL, for URL-level deduplication:
    *   - scheme and host lower-cased;
    *   - default ports dropped (http:80, https:443), explicit others kept;
    *   - empty path normalised to "/";
    *   - tracking parameters removed, survivors sorted byte-wise and
    *     re-joined (param ORDER never distinguishes two URLs);
    *   - fragment dropped (never sent to the server).
    * Null when `url` is not a well-formed absolute URL.
    */
  def canonicalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val hst = host(url)
    val prt = port(url)
    val keepPort = prt.isNotNull &&
      !((sch === "http" && prt === 80) || (sch === "https" && prt === 443))
    val portPart = when(keepPort, concat(lit(":"), prt.cast("string"))).otherwise(lit(""))
    val rawPath = path(url)
    val pathPart = when(rawPath === "", lit("/")).otherwise(rawPath)
    val params = filter(
      split(coalesce(queryString(url), lit("")), "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val qs = array_join(array_sort(params), "&")
    val qsPart = when(qs === "", lit("")).otherwise(concat(lit("?"), qs))
    when(sch.isNull || hst.isNull, lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), hst, portPart, pathPart, qsPart))
  }
}
