package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization for web-crawl corpora. The input table is keyed by
  * `url` (BASELINE.json input_hint) and the node identity of the whole
  * dedup graph is `xxhash64(url)` — so two crawls of the same page under
  * cosmetically different URLs (tracking params, fragments, default ports,
  * host case) MUST collapse to one canonical key before anything else runs,
  * exactly as the reference canonicalizes record identity at ingest
  * (`/root/reference/src/event_dedup/ingestion/file_processor.py:68-130`
  * flattens and sanitizes before the id-keyed insert).
  *
  * All pure `Column` chains over Spark's codegen'd `parse_url` /
  * regexp/array kernels — scan-speed, no UDFs, safe inside any projection.
  */
object UrlOps {

  /** Lowercased host with any leading "www." stripped. */
  def host(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Compact embedded subset of the public suffix list's MULTI-LABEL
    * suffixes (publicsuffix.org — public data): hosts ending in one of
    * these take three labels for the registered domain, everything else
    * takes two. Covers the common ccTLD second-level registries
    * (co.uk-style); the full PSL — including its 3-label and wildcard
    * rules — is a data-file swap into this one list.
    */
  private val MultiPartSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "org.nz", "net.nz", "govt.nz", "ac.nz", "school.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp", "gr.jp", "lg.jp",
    "com.br", "org.br", "net.br", "gov.br", "edu.br",
    "com.cn", "org.cn", "net.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "org.ar", "net.ar", "gob.ar", "edu.ar",
    "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr",
    "com.tw", "org.tw", "net.tw", "gov.tw", "edu.tw",
    "co.in", "org.in", "net.in", "gov.in", "ac.in", "edu.in",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
    "com.my", "org.my", "net.my", "edu.my", "gov.my",
    "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.co", "org.co", "net.co", "edu.co", "gov.co",
    "com.ua", "org.ua", "net.ua", "edu.ua", "gov.ua", "in.ua",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.ph", "org.ph", "net.ph", "edu.ph", "gov.ph",
    "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn", "ac.vn",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "net.th",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "net.id",
    "com.pk", "org.pk", "net.pk", "edu.pk", "gov.pk",
    "com.bd", "org.bd", "net.bd", "edu.bd", "gov.bd", "ac.bd",
    "com.ng", "org.ng", "net.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
    "com.do", "com.ec", "com.uy", "com.py", "com.bo", "com.pe", "com.ve",
    "com.gt", "com.sv", "com.ni", "com.pa")

  // "<label>.<multi-part suffix or single label>$": Java regex find() takes
  // the LEFTMOST matching start, so for "x.example.co.uk" the match anchors
  // at "example" and the ordered alternation prefers "co.uk" over a bare
  // final label — yielding "example.co.uk", while "x.example.com" yields
  // "example.com". One compiled regex, codegen-friendly.
  private val RegisteredDomainRe =
    "([^.]+\\.(?:" + MultiPartSuffixes.map(_.replace(".", "\\.")).mkString("|") +
      "|[^.]+))$"

  /** Registered domain: PSL-subset-aware last-2-or-3 labels of the host. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), RegisteredDomainRe, 1)

  /** Path segment count ("/a/b/c" → 3; "/" and "" → 0). */
  def pathDepth(url: Column): Column = {
    val p = parse_url(url, lit("PATH"))
    size(filter(split(coalesce(p, lit("")), "/"), s => length(s) > 0))
  }

  private val TrackingParams =
    Seq("utm_[^=]*", "ref", "fbclid", "gclid", "mc_cid", "mc_eid", "igshid")

  /** Canonical URL: lowercase scheme+host, strip "www.", drop default ports
    * (:80 http / :443 https), drop the fragment, remove tracking query
    * params, sort surviving params, drop a bare trailing "?". The path keeps
    * its case (paths are case-sensitive on most origins).
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val h = host(url)
    val port = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:(\\d+)", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    val trackingRe = "^(" + TrackingParams.mkString("|") + ")="
    val params = filter(
      split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
      p => length(p) > 0 && !p.rlike(trackingRe))
    val query = array_join(array_sort(params), "&")
    concat(
      scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }
}
