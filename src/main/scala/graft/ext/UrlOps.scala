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

  /** Parse per-domain robots.txt payloads into the RULE TABLE for one
    * crawler identity: `(domain, rule_allow, prefix)` — the
    * crawl-POLITENESS half of page processing (RFC 9309 subset).
    *
    * Semantics: comments (`#` to end of line) stripped, directive
    * names case-insensitive, a GROUP is a maximal run of consecutive
    * `User-agent` lines plus the Allow/Disallow rules that follow it;
    * if any group names `userAgent` (case-insensitive) the agent obeys
    * exactly those groups, otherwise the `*` groups; empty-valued
    * rules are the RFC no-op; rules before any `User-agent` line
    * belong to no group and bind nobody. Path patterns may carry the
    * RFC 9309 §2.2.3 wildcards — `*` (any character run) and a
    * trailing `$` (end-of-path anchor) — which [[robotsDecisions]]
    * matches and ranks by literal specificity. `Crawl-delay` /
    * `Sitemap` directives live in [[parseCrawlDelay]] /
    * [[sitemapDirectives]].
    *
    * Shape: one narrow line explode + windows PARTITIONED BY DOMAIN
    * (a robots.txt is KB-sized, so per-domain windows never skew) and
    * one domain-keyed group join — at crawl scale the output rule
    * table is broadcastable to the frontier join in
    * [[robotsDecisions]].
    */
  def parseRobots(robots: DataFrame, userAgent: String,
      robotsCol: String = "robots_txt", domainCol: String = "domain"): DataFrame = {
    val ua = userAgent.toLowerCase
    val lines = robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(robotsCol), "\n")).as(Seq("ln", "raw")))
      .select(col("domain"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("domain"), col("ln"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)).as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("value"))
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("ua_start", (col("directive") === "user-agent" &&
        coalesce(lag(col("directive"), 1).over(w) =!= "user-agent", lit(true)))
        .cast("int"))
      .withColumn("grp", sum(col("ua_start")).over(w))
    val groupUas = grouped.filter(col("directive") === "user-agent")
      .groupBy(col("domain"), col("grp"))
      .agg(max((lower(col("value")) === ua).cast("int")).as("names_ua"),
        max((col("value") === "*").cast("int")).as("names_star"))
    val selected = groupUas
      .withColumn("has_ua",
        max(col("names_ua")).over(Window.partitionBy(col("domain"))))
      .filter((col("has_ua") === 1 && col("names_ua") === 1) ||
        (col("has_ua") === 0 && col("names_star") === 1))
      .select(col("domain"), col("grp"))
    grouped
      .filter(col("directive").isin("allow", "disallow") && col("value") =!= "")
      .join(selected, Seq("domain", "grp"))
      .select(col("domain"), (col("directive") === "allow").as("rule_allow"),
        col("value").as("prefix"))
      .distinct()
  }

  /** Per-domain `Crawl-delay` extraction — the politeness TIMING half
    * of robots parsing ([[parseRobots]] owns the allow/disallow half;
    * this closes its documented Crawl-delay boundary). Group
    * segmentation follows the same consecutive-User-agent rule and
    * considers user-agent, allow, disallow AND crawl-delay lines (so
    * groups match [[parseRobots]]'s exactly whenever no crawl-delay
    * line sits between consecutive User-agent lines); group selection
    * is the same exact-UA-overrides-`*` rule. From the selected
    * groups, the delay is the MINIMUM integer-seconds value (the
    * conservative choice when a file repeats the directive);
    * non-numeric values are ignored (the RFC says nothing — dropping
    * beats guessing); headerless lines bind nobody; a domain with no
    * usable value gets `defaultDelayS`. Output: one `(domain,
    * delay_s)` row per input domain, never NULL.
    */
  def parseCrawlDelay(robots: DataFrame, userAgent: String,
      defaultDelayS: Long = 1L, robotsCol: String = "robots_txt",
      domainCol: String = "domain"): DataFrame = {
    val ua = userAgent.toLowerCase
    val lines = robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(robotsCol), "\n")).as(Seq("ln", "raw")))
      .select(col("domain"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("domain"), col("ln"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)).as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("value"))
      .filter(col("directive").isin(
        "user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("ua_start", (col("directive") === "user-agent" &&
        coalesce(lag(col("directive"), 1).over(w) =!= "user-agent", lit(true)))
        .cast("int"))
      .withColumn("grp", sum(col("ua_start")).over(w))
    val groupUas = grouped.filter(col("directive") === "user-agent")
      .groupBy(col("domain"), col("grp"))
      .agg(max((lower(col("value")) === ua).cast("int")).as("names_ua"),
        max((col("value") === "*").cast("int")).as("names_star"))
    val selected = groupUas
      .withColumn("has_ua",
        max(col("names_ua")).over(Window.partitionBy(col("domain"))))
      .filter((col("has_ua") === 1 && col("names_ua") === 1) ||
        (col("has_ua") === 0 && col("names_star") === 1))
      .select(col("domain"), col("grp"))
    val delays = grouped
      .filter(col("directive") === "crawl-delay" &&
        col("value").rlike("^[0-9]+$"))
      .join(selected, Seq("domain", "grp"))
      .groupBy(col("domain"))
      .agg(min(col("value").cast("long")).as("delay_s"))
    robots.select(col(domainCol).as("domain")).distinct()
      .join(delays, Seq("domain"), "left")
      .select(col("domain"),
        coalesce(col("delay_s"), lit(defaultDelayS)).as("delay_s"))
  }

  /** `Sitemap:` directive extraction — the crawl-DISCOVERY half of
    * robots parsing ([[parseRobots]] owns allow/disallow,
    * [[parseCrawlDelay]] owns timing; this closes parseRobots'
    * documented Sitemap boundary). Per RFC 9309 §2.3 sitemap lines are
    * UA-INDEPENDENT — they live outside any User-agent group and bind
    * every crawler — so no group segmentation runs here: every
    * non-comment `Sitemap:` line (directive case-insensitive, value
    * whitespace-trimmed, empty values dropped) yields one
    * `(domain, sitemap_url)` row, de-duplicated. Same line machinery
    * as [[parseRobots]]: comments stripped `#`-to-EOL, RE2-safe
    * directive/value split, all replayable in DuckDB — which is what
    * puts the t60 discovery chain under the hash gate.
    */
  def sitemapDirectives(robots: DataFrame, robotsCol: String = "robots_txt",
      domainCol: String = "domain"): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        explode(split(col(robotsCol), "\n")).as("raw"))
      .select(col("domain"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("domain"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)).as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("value"))
      .filter(col("directive") === "sitemap" && col("value") =!= "")
      .select(col("domain"), col("value").as("sitemap_url"))
      .distinct()

  /** The `<url>…</url>` entry blocks of a sitemap XML payload, in
    * document order. RE2-safe (non-greedy block match, `(?is)` for
    * case/newline tolerance) so the extraction replays byte-for-byte
    * in DuckDB; pair with [[sitemapLoc]]/[[sitemapLastmod]] per block.
    * For sitemap-INDEX payloads (`<sitemapindex>`) extract the child
    * sitemap urls with [[sitemapIndexEntries]] first, then apply this
    * to each fetched child — the t60b chain.
    */
  def sitemapEntries(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<url\\s*>.*?</url\\s*>"), lit(0))

  /** The `<sitemap>…</sitemap>` CHILD blocks of a sitemap-INDEX
    * payload (`<sitemapindex>` — what every large site actually serves
    * at its robots-declared sitemap URL): each block's `<loc>` names
    * another sitemap FILE, not a page. Same RE2-safe non-greedy
    * grammar as [[sitemapEntries]]; extract each child's url with
    * [[sitemapLoc]] (the tag grammar is identical), then parse the
    * fetched child payloads with [[sitemapEntries]] — one recursion
    * level, which covers the standard index-of-leaf-sitemaps layout.
    * Indexes nested deeper than one level (an index naming another
    * index) remain a documented boundary. A plain `<urlset>` payload
    * has no `<sitemap>` blocks, so this yields an empty array on leaf
    * files — callers can route payloads by emptiness without sniffing.
    */
  def sitemapIndexEntries(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<sitemap\\s*>.*?</sitemap\\s*>"), lit(0))

  /** The whitespace-trimmed `<loc>` value of one [[sitemapEntries]]
    * block ('' when absent — callers filter, the htmlLinks empty-href
    * convention).
    */
  def sitemapLoc(entry: Column): Column =
    trim(regexp_extract(entry, "(?is)<loc\\s*>([^<]*)</loc\\s*>", 1))

  /** The whitespace-trimmed `<lastmod>` value of one [[sitemapEntries]]
    * block ('' when the optional tag is absent — kept as the empty
    * string so the gate hashes no NULLs).
    */
  def sitemapLastmod(entry: Column): Column =
    trim(regexp_extract(entry, "(?is)<lastmod\\s*>([^<]*)</lastmod\\s*>", 1))

  /** Bounded-depth sitemap-TREE expansion — closes the t60b "one
    * recursion level" boundary for any nesting a real site serves
    * (index → index → … → leaf): walk root sitemap URLs through a
    * fetched-payload table, following `<sitemapindex>` children level
    * by level until leaves, a fetch gap, a cycle, or `maxDepth`.
    *
    * `seeds` is (domain, sitemap_url) — the roots, e.g.
    * [[sitemapDirectives]] output; `payloads` is (url, xml) — every
    * fetched sitemap body keyed by its URL (the crawler's fetch store;
    * a child URL with no payload row is simply not yet fetched and
    * contributes nothing — the inner join IS the coverage contract).
    * Returns one row per LEAF page entry:
    * (domain, sitemap_url [the root], depth [of the leaf payload, 0
    * for a root that is itself a `<urlset>`], leaf_url, pos, loc,
    * lastmod) — loc/lastmod via the [[sitemapEntries]] grammar, empty
    * locs dropped (the t48 convention).
    *
    * Safety at crawl scale: a (domain, url) VISITED set anti-joins
    * each level's children, so self- or cross-referencing indexes
    * terminate instead of looping (the fixture's root-pointing child
    * exercises this); the driver loop is bounded by `maxDepth` and
    * stops early on an empty frontier (one bounded `isEmpty` per
    * level); index payloads still unexpanded when the cap fires are
    * dropped — an auditor diffs the leaf set against its payload
    * inventory to find them. Each level's frontier/visited/leaf
    * frames are localCheckpointed and the previous level's blocks
    * freed ([[graft.ops.Blocks]] contract — constant plan depth and
    * block residency however deep the tree); all joins run at
    * domain×sitemap cardinality, never page cardinality.
    */
  def expandSitemaps(seeds: DataFrame, payloads: DataFrame,
      maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    // fetch-table materialized once: each level's fetch join consumes
    // it twice (leaf split + child split), so an unmaterialized payload
    // synthesis — for the t60c fixture a whole directive-table chain —
    // would re-evaluate ~2× per level in every checkpoint job
    val pay = payloads.select(col("url"), col("xml")).localCheckpoint()
    var frontier = seeds
      .select(col("domain"), col("sitemap_url"),
        col("sitemap_url").as("url"), lit(0L).as("depth"))
      .localCheckpoint()
    var visited = frontier.select(col("domain"), col("url")).localCheckpoint()
    val levelLeaves = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var depth = 0
    var exhausted = false
    while (depth < maxDepth && !exhausted) {
      val fetched = frontier.join(pay, "url")
        .withColumn("children", sitemapIndexEntries(col("xml")))
      val leaves = fetched.filter(size(col("children")) === 0)
        .select(col("domain"), col("sitemap_url"),
          col("url").as("leaf_url"), col("depth"),
          posexplode(sitemapEntries(col("xml"))))
        .withColumnRenamed("col", "entry")
        .select(col("domain"), col("sitemap_url"), col("depth"),
          col("leaf_url"), col("pos").cast("long").as("pos"),
          sitemapLoc(col("entry")).as("loc"),
          sitemapLastmod(col("entry")).as("lastmod"))
        .filter(col("loc") =!= "")
        .localCheckpoint()
      levelLeaves += leaves
      val children = fetched.filter(size(col("children")) > 0)
        .select(col("domain"), col("sitemap_url"),
          explode(col("children")).as("centry"))
        .select(col("domain"), col("sitemap_url"),
          sitemapLoc(col("centry")).as("url"))
        .filter(col("url") =!= "")
        .join(visited, Seq("domain", "url"), "left_anti")
        .distinct()
        .withColumn("depth", lit(depth + 1L))
        .localCheckpoint()
      val prevFrontier = frontier
      val prevVisited = visited
      frontier = children
      visited = prevVisited
        .unionByName(children.select(col("domain"), col("url")))
        .localCheckpoint()
      graft.ops.Blocks.free(prevFrontier)
      graft.ops.Blocks.free(prevVisited)
      depth += 1
      exhausted = frontier.isEmpty
    }
    graft.ops.Blocks.free(frontier)
    graft.ops.Blocks.free(visited)
    graft.ops.Blocks.free(pay)
    // collapse the per-level leaf checkpoints into ONE returned table
    // (at most one live checkpoint survives the call)
    val out = levelLeaves.reduce(_.unionByName(_)).localCheckpoint()
    levelLeaves.foreach(graft.ops.Blocks.free)
    out
  }

  /** The RE2 regex equivalent of one robots.txt path pattern
    * (RFC 9309 §2.2.3): regex metacharacters in literal runs are
    * escaped, `*` becomes `.*`, and a single TRAILING `$` becomes the
    * end-of-subject anchor (a `$` anywhere else is literal — the
    * convention of every major implementation). Anchored at the start
    * (`^`), open at the end — a wildcard-free pattern degrades to the
    * classic literal-prefix match. Built from RE2-safe pieces only, so
    * the identical conversion replays in any RE2 engine (the t52b
    * oracle re-derives it in SQL).
    */
  def robotsPatternRegex(pattern: Column): Column = {
    val anchored = pattern.rlike("\\$$")
    val base = when(anchored, pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    // escape every RE2 metacharacter EXCEPT '*' (translated below);
    // the replacement emits a literal backslash before the char
    val esc = regexp_replace(base, "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** The literal-character count of a robots path pattern — RFC 9309's
    * longest-match specificity key: wildcards (`*` anywhere, one
    * trailing `$`) contribute nothing, every other character counts.
    */
  def robotsPatternLitLen(pattern: Column): Column =
    length(regexp_replace(regexp_replace(pattern, "\\$$", ""), "\\*", ""))

  /** Decide every frontier URL against a [[parseRobots]] rule table:
    * most-specific-match wins (specificity = the pattern's LITERAL
    * length, so a 7-literal-char wildcard pattern like
    * `/a/&#42;.php` beats `/a/` with 3 — the RFC 9309 longest-match
    * rule generalized to wildcards), an
    * Allow beats a Disallow of equal specificity (the RFC tie rule),
    * no matching rule means allowed. Patterns may carry `*` / trailing
    * `$` wildcards ([[robotsPatternRegex]]); wildcard-free rules match
    * as plain literal prefixes, exactly as before. The match subject
    * is everything after the authority (path + query, the Googlebot
    * convention), `/` when empty. Output: the input columns +
    * `(path, matched_allow, matched_prefix, allowed)` — matched
    * columns NULL when no rule fired.
    *
    * `keyCols` must uniquely key `urls` (they partition the
    * best-match window). Scale shape: the rule table is per-domain
    * KB-sized — broadcast the join; the window partitions at URL
    * granularity, so nothing skews. The regex compiles per candidate
    * row (a non-foldable pattern can't be codegen-cached), which is
    * fine at rule-table fan-out — a domain's rule count is tiny.
    */
  def robotsDecisions(urls: DataFrame, rules: DataFrame, keyCols: Seq[String],
      urlCol: String = "url_canon", domainCol: String = "domain"): DataFrame = {
    val rawPath = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    val pathed = urls.withColumn("path",
      when(rawPath === "", lit("/")).otherwise(rawPath))
    val matches = pathed.join(rules, Seq(domainCol))
      .filter(regexp_like(col("path"), robotsPatternRegex(col("prefix"))))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(robotsPatternLitLen(col("prefix")).desc, col("rule_allow").desc,
        col("prefix").asc)
    val best = matches.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(keyCols.map(col) :+ col("rule_allow").as("matched_allow") :+
        col("prefix").as("matched_prefix"): _*)
    pathed.join(best, keyCols, "left")
      .withColumn("allowed", coalesce(col("matched_allow"), lit(true)))
  }
}
