package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + domain-level rollups — the web-curation
  * primitives that run before any text op in a crawl pipeline
  * (domain blocklists, per-domain caps, URL-level exact dedup all key
  * on a CANONICAL url, not the raw crawl string).
  *
  * Everything is Catalyst built-ins over RE2-SAFE regexes (no
  * lookarounds), so the exact same patterns replay in DuckDB/Go/Rust
  * RE2 engines — the t21 gate pins Spark == DuckDB on every row. All
  * per-row maps: narrow, codegen'd, no UDF, no shuffle.
  */
object UrlOps {

  /** Canonical form: lowercase scheme+authority, default-port strip
    * (:443 https / :80 http), fragment dropped, `utm_*` tracking params
    * removed (query otherwise preserved in order), trailing slashes
    * stripped from the path. Malformed inputs (no scheme) pass through
    * the same rules on a best-effort basis rather than erroring — at
    * crawl scale a throwing canonicalizer is a pipeline killer.
    */
  def canonicalizeUrl(url: Column): Column = {
    // scheme://host[:port] — lowercased, default ports stripped
    val authority = regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        ":443$", ""),
      ":80$", "")
    // path component (between authority and ?/#), trailing slashes off
    val path = regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    // query string without the fragment, utm_* params filtered out.
    // The fragment is stripped FIRST: a '?' after '#' (…/p#frag?x=1)
    // is fragment content, not a query, and must vanish with it.
    val rawQs = regexp_extract(
      regexp_replace(url, "#.*$", ""), "\\?([^#]*)", 1)
    val keptQs = array_join(
      filter(split(rawQs, "&"), p => !p.startsWith("utm_")), "&")
    concat(authority, path,
      when(keptQs === "", lit("")).otherwise(concat(lit("?"), keptQs)))
  }

  /** Hostname of a (canonical or raw) url, lowercased, port dropped. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))

  /** Registrable-domain approximation: the host with one leading
    * `www.` label stripped. (A full public-suffix-list lookup is a
    * broadcast join against the PSL table — out of scope here; `www.`
    * covers the dominant crawl alias.)
    */
  def registrableDomain(url: Column): Column =
    regexp_replace(host(url), "^www\\.", "")

  /** URL-keyed exact dedup — crawl dedup STEP ONE (before any content
    * hashing): group on the canonical form, keep the smallest id. Raw
    * variants that differ only in case / default port / tracking
    * params / trailing slash / fragment collapse to one row. One
    * map-side-combinable agg on the canonical key.
    */
  def urlDedup(docs: DataFrame, urlCol: String,
      idCol: String = "doc_id"): DataFrame =
    docs.select(canonicalizeUrl(col(urlCol)).as("url_canon"), col(idCol))
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Per-document canonical url + domain, plus the domain's doc count
    * (the per-domain-cap / blocklist join key and its weight) — ONE
    * narrow map and ONE window exchange on domain.
    */
  def withDomainStats(docs: DataFrame, urlCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    val w = Window.partitionBy(col("domain"))
    docs.select(col(idCol), canon.as("url_canon"),
        registrableDomain(canon).as("domain"))
      .withColumn("dom_docs", count(lit(1)).over(w))
  }
}
