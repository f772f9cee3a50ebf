package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-9 curation operators: URL canonicalization, Gopher rules,
  * bigram LM scoring. The full-table cross-engine proofs live in the
  * t20/t21/t22 oracle gates; these specs pin the EDGE semantics the
  * fixture can't reach.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parseRobots/robotsDecisions: groups, UA override, ties, no-ops, headerless rules") {
    val txt = Seq(
      "# politeness header",
      "Disallow: /orphan   # rule before any group: binds NOBODY",
      "User-Agent: other-bot",
      "User-agent: *",           // same group as other-bot (consecutive UA lines)
      "DisAllow: /a/",
      "Allow: /a/",              // equal-length tie with the Disallow: allow wins
      "Allow: /a/special",
      "Disallow:",               // empty value: RFC no-op
      "",
      "User-agent: graftbot",    // NEW group (previous line is a rule run)
      "Disallow: /b/",
      "Allow: /b/ok").mkString("\n")
    val robots = Seq(("d1.com", txt),
      ("d2.com", "User-agent: *\nDisallow: /")).toDF("domain", "robots_txt")

    // graftbot: the exact-UA group overrides * on d1; d2 falls back to *
    val gb = UrlOps.parseRobots(robots, "GraftBot")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    assert(gb == Set(("d1.com", false, "/b/"), ("d1.com", true, "/b/ok"),
      ("d2.com", false, "/")), s"graftbot rules: $gb")
    // an unnamed bot uses the * group — including the tie pair — and
    // never sees the orphan rule or the empty no-op
    val anon = UrlOps.parseRobots(robots, "nobody")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    assert(anon == Set(("d1.com", false, "/a/"), ("d1.com", true, "/a/"),
      ("d1.com", true, "/a/special"), ("d2.com", false, "/")), s"star rules: $anon")

    val urls = Seq(
      (1L, "https://d1.com/a/x"),    // tie /a/ vs /a/: allow wins
      (2L, "https://d1.com/a/special/page"), // longest prefix: allow
      (3L, "https://d1.com/b/x"),    // graftbot-only path, * group: no match
      (4L, "https://d1.com/orphan"), // headerless rule binds nobody
      (5L, "https://d2.com"),        // empty path → '/' → Disallow: /
      (6L, "https://d2.com/deep/page")).toDF("id", "url_canon")
      .withColumn("domain", UrlOps.registrableDomain(col("url_canon")))
    val dec = UrlOps.robotsDecisions(
        urls, UrlOps.parseRobots(robots, "nobody"), Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("allowed"), Option(r.getAs[String]("matched_prefix"))))
      .toMap
    assert(dec(1L) == ((true, Some("/a/"))), s"tie: ${dec(1L)}")
    assert(dec(2L) == ((true, Some("/a/special"))), s"longest: ${dec(2L)}")
    assert(dec(3L) == ((true, None)), s"no-match default: ${dec(3L)}")
    assert(dec(4L) == ((true, None)), s"orphan rule fired: ${dec(4L)}")
    assert(dec(5L) == ((false, Some("/"))), s"root path: ${dec(5L)}")
    assert(dec(6L) == ((false, Some("/"))), s"deep path: ${dec(6L)}")
    // graftbot on the same urls: /b/x blocked, /b/ok allowed, /a/* free
    val gdec = UrlOps.robotsDecisions(
        urls, UrlOps.parseRobots(robots, "graftbot"), Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed")).toMap
    assert(gdec(1L) && gdec(2L) && !gdec(3L) && gdec(4L) && !gdec(5L))
    val okUrl = Seq((7L, "https://d1.com/b/ok/sub")).toDF("id", "url_canon")
      .withColumn("domain", UrlOps.registrableDomain(col("url_canon")))
    val ok = UrlOps.robotsDecisions(
      okUrl, UrlOps.parseRobots(robots, "graftbot"), Seq("id")).collect()(0)
    assert(ok.getAs[Boolean]("allowed") && ok.getAs[String]("matched_prefix") == "/b/ok")
  }

  test("robots wildcards: pattern→regex conversion, literal-length precedence, $ anchor, escaped metachars") {
    // conversion unit cases: regex + literal length per pattern
    def conv(patterns: Seq[String]): Seq[(String, String, Int)] =
      patterns.toDF("p").select(col("p"),
          UrlOps.robotsPatternRegex(col("p")).as("rx"),
          UrlOps.robotsPatternLitLen(col("p")).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(conv(Seq("/a/", "/a/*1", "/b/*3$", "/d/*?z=2$", "/*.php$", "/x$y")) == Seq(
      ("/a/", "^/a/", 3),                       // wildcard-free: plain prefix
      ("/a/*1", "^/a/.*1", 4),                  // mid *
      ("/b/*3$", "^/b/.*3$", 4),                // trailing $ anchors
      ("/d/*?z=2$", "^/d/.*\\?z=2$", 7),        // ? escaped, $ anchors
      ("/*.php$", "^/.*\\.php$", 5),            // . escaped
      ("/x$y", "^/x\\$y", 4)))                  // mid $ is literal
    // decisions over a wildcard battery: specificity by LITERAL length,
    // allow-wins tie, anchored rules, regex metachars never leak
    val robots = Seq(("d.com", Seq(
      "User-agent: *",
      "Disallow: /a/*1",        // lit 4
      "Allow: /a/*1?q=1$",      // lit 9: outranks the disallow where both match
      "Disallow: /b/*3$",       // lit 4 — equal tie with the next line
      "Allow: /b/*3$",          //   → allow wins
      "Disallow: /c/",          // lit 3 literal
      "Allow: /c/*7$"           // lit 4 wildcard beats it for ids ending in 7
    ).mkString("\n"))).toDF("domain", "robots_txt")
    val rules = UrlOps.parseRobots(robots, "graftbot")
    val urls = Seq(
      (1L, "https://d.com/a/21?q=1"),  // both /a/ rules match → allow (lit 9)
      (2L, "https://d.com/a/22?q=1"),  // only the disallow (…1 before ?q=1 missing)
      (3L, "https://d.com/b/13"),      // equal-literal tie → allow
      (4L, "https://d.com/b/14"),      // $ anchor: no rule matches → default
      (5L, "https://d.com/c/17"),      // wildcard outranks the literal /c/
      (6L, "https://d.com/c/18")       // only the literal /c/ → disallow
    ).toDF("id", "url_canon")
      .withColumn("domain", UrlOps.registrableDomain(col("url_canon")))
    val dec = UrlOps.robotsDecisions(urls, rules, Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("allowed"), Option(r.getAs[String]("matched_prefix")))))
      .toMap
    assert(dec(1L) == ((true, Some("/a/*1?q=1$"))), dec(1L))
    assert(dec(2L) == ((false, Some("/a/*1"))), dec(2L))
    assert(dec(3L) == ((true, Some("/b/*3$"))), dec(3L))
    assert(dec(4L) == ((true, None)), dec(4L))
    assert(dec(5L) == ((true, Some("/c/*7$"))), dec(5L))
    assert(dec(6L) == ((false, Some("/c/"))), dec(6L))
  }

  test("sitemapIndexEntries: <sitemap> child blocks only, leaf files yield none, one-level recursion shape") {
    val index =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap>
        |    <loc> https://d.com/sm/1.xml </loc>
        |  </sitemap>
        |  <SITEMAP ><LOC>https://d.com/sm/2.xml</LOC></SITEMAP>
        |  <sitemap><loc>   </loc></sitemap>
        |</sitemapindex>""".stripMargin
    val kids = Seq(index).toDF("xml")
      .select(posexplode(UrlOps.sitemapIndexEntries(col("xml"))))
      .toDF("pos", "entry")
      .select(col("pos"), UrlOps.sitemapLoc(col("entry")).as("loc"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(kids == Seq((0, "https://d.com/sm/1.xml"),
      (1, "https://d.com/sm/2.xml"), (2, "")), kids)
    // a LEAF sitemap has no <sitemap> blocks (the wrapper tag's name
    // does not prefix-match the child grammar), and an index's <url>
    // decoys are equally invisible to the child extractor
    val leaf = "<urlset><url><loc>https://d.com/p</loc></url></urlset>"
    assert(Seq(leaf).toDF("xml")
      .select(UrlOps.sitemapIndexEntries(col("xml")).as("e"))
      .collect()(0).getSeq[String](0).isEmpty)
    // and sitemapEntries on the INDEX payload finds no page entries
    assert(Seq(index).toDF("xml")
      .select(UrlOps.sitemapEntries(col("xml")).as("e"))
      .collect()(0).getSeq[String](0).isEmpty)
  }

  test("expandSitemaps: depth-2 walk with provenance, cycle drop, fetch gap, whitespace loc, depth cap") {
    val seeds = Seq(("d.com", "https://d.com/root.xml"))
      .toDF("domain", "sitemap_url")
    def idx(locs: String*): String =
      "<sitemapindex>" + locs.map(l =>
        s"<sitemap >\n  <loc> $l </loc>\n</sitemap>").mkString("\n") +
        "</sitemapindex>"
    def leaf(locs: String*): String =
      "<urlset>" + locs.map(l =>
        s"<url ><loc>  $l  </loc></url>").mkString("\n") + "</urlset>"
    val payloads = Seq(
      // root: an index child, a leaf child, a SELF-cycle, an unfetched
      // child, and a whitespace-only loc
      ("https://d.com/root.xml", idx("https://d.com/a.xml",
        "https://d.com/b.xml", "https://d.com/root.xml",
        "https://d.com/missing.xml", "   ")),
      // a: index of one leaf PLUS a back-reference to the root (a
      // 2-hop cycle — already visited at level 0)
      ("https://d.com/a.xml", idx("https://d.com/c.xml",
        "https://d.com/root.xml")),
      ("https://d.com/b.xml", leaf("https://d.com/p/b0")),
      ("https://d.com/c.xml", leaf("https://d.com/p/c0", "https://d.com/p/c1"))
    ).toDF("url", "xml")
    val got = UrlOps.expandSitemaps(seeds, payloads, maxDepth = 3)
      .collect().map(r => (r.getAs[String]("leaf_url"),
        r.getAs[Long]("depth"), r.getAs[Long]("pos"),
        r.getAs[String]("loc"), r.getAs[String]("sitemap_url"))).toSet
    assert(got == Set(
      ("https://d.com/b.xml", 1L, 0L, "https://d.com/p/b0", "https://d.com/root.xml"),
      ("https://d.com/c.xml", 2L, 0L, "https://d.com/p/c0", "https://d.com/root.xml"),
      ("https://d.com/c.xml", 2L, 1L, "https://d.com/p/c1", "https://d.com/root.xml")), got)
    // depth cap: maxDepth = 2 stops before c.xml is ever fetched —
    // only the depth-1 leaf lists
    val capped = UrlOps.expandSitemaps(seeds, payloads, maxDepth = 2)
      .collect().map(_.getAs[String]("leaf_url")).toSet
    assert(capped == Set("https://d.com/b.xml"), capped)
    // a root that is ITSELF a leaf lists at depth 0
    val leafSeed = Seq(("e.com", "https://e.com/s.xml"))
      .toDF("domain", "sitemap_url")
    val leafPay = Seq(("https://e.com/s.xml", leaf("https://e.com/p")))
      .toDF("url", "xml")
    val d0 = UrlOps.expandSitemaps(leafSeed, leafPay, maxDepth = 3)
      .collect().map(r => (r.getAs[Long]("depth"), r.getAs[String]("loc")))
    assert(d0.toSeq == Seq((0L, "https://e.com/p")), d0.toSeq)
  }

  test("parseCrawlDelay: UA override, min of repeats, malformed ignored, headerless binds nobody, default") {
    def delays(rows: Seq[(String, String)], ua: String): Map[String, Long] =
      UrlOps.parseCrawlDelay(rows.toDF("domain", "robots_txt"), ua)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d1 = Seq(
      "Crawl-delay: 9",          // headerless: binds nobody
      "User-agent: *",
      "Disallow: /a/",
      "Crawl-delay: fast",       // non-numeric: ignored
      "Crawl-delay: 5",
      "Crawl-delay: 3",          // repeat: MIN wins
      "",
      "User-agent: graftbot",
      "Crawl-delay: 7").mkString("\n")
    val robots = Seq(
      ("d1.com", d1),
      ("d2.com", "User-agent: *\nDisallow: /"),      // no delay → default
      ("d3.com", "Crawl-delay: 4"),                  // ONLY headerless → default
      ("d4.com", "User-agent: *\nCrawl-delay: 08"))  // leading zero is numeric
    // graftbot: the exact-UA group overrides the * group's 3
    val gb = delays(robots, "GraftBot")
    assert(gb == Map("d1.com" -> 7L, "d2.com" -> 1L, "d3.com" -> 1L,
      "d4.com" -> 8L), gb)
    // an unnamed bot takes the * group: min(5, 3), fast ignored
    val anon = delays(robots, "nobody")
    assert(anon("d1.com") == 3L && anon("d2.com") == 1L && anon("d3.com") == 1L)
    // every input domain appears exactly once, never NULL
    assert(anon.size == 4)
  }

  test("sitemapDirectives: UA-independent, comment/case/padding/empty-value/duplicate handling") {
    val txt = Seq(
      "# Sitemap: https://d1.com/commented.xml",   // commented out: ignored
      "User-agent: *",
      "Disallow: /a/",
      "Sitemap: https://d1.com/sitemap.xml",
      "SiteMap:    https://d1.com/sm2.xml   ",     // mixed case + padding
      "Sitemap:",                                  // empty value: dropped
      "Sitemap: https://d1.com/sitemap.xml"        // duplicate: distinct
    ).mkString("\n")
    val robots = Seq(("d1.com", txt),
      ("d2.com", "User-agent: *\nDisallow: /")).toDF("domain", "robots_txt")
    val sm = UrlOps.sitemapDirectives(robots).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sm == Set(("d1.com", "https://d1.com/sitemap.xml"),
      ("d1.com", "https://d1.com/sm2.xml")), sm)
  }

  test("sitemapEntries/Loc/Lastmod: case-insensitive tags, whitespace, optional lastmod, blank loc") {
    val xml =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>  https://d1.com/a  </loc>
        |    <lastmod>2026-01-02</lastmod>
        |  </url>
        |  <URL ><LOC>https://d1.com/b</LOC></URL>
        |  <url><loc>   </loc></url>
        |</urlset>""".stripMargin
    val rows = Seq(xml).toDF("xml")
      .select(posexplode(UrlOps.sitemapEntries(col("xml"))))
      .toDF("pos", "entry")
      .select(col("pos"), UrlOps.sitemapLoc(col("entry")).as("loc"),
        UrlOps.sitemapLastmod(col("entry")).as("lastmod"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(
      (0, "https://d1.com/a", "2026-01-02"),
      (1, "https://d1.com/b", ""),        // uppercase tags, no lastmod
      (2, "", "")), rows)                 // blank loc extracted, caller filters
  }

  test("canonicalizeUrl: case, ports, utm params, fragments, trailing slashes") {
    val cases = Seq(
      // lowercased scheme+host, default https port stripped
      ("HTTPS://WWW.Example.COM:443/Path", "https://www.example.com/Path"),
      // http default port stripped; non-default kept
      ("http://a.com:80/x", "http://a.com/x"),
      ("http://a.com:8080/x", "http://a.com:8080/x"),
      // fragment dropped, trailing slash stripped
      ("https://a.com/x/#frag", "https://a.com/x"),
      // utm params removed, others kept in order
      ("https://a.com/p?utm_source=x&id=1&utm_medium=y&q=2", "https://a.com/p?id=1&q=2"),
      // all params are utm → no query at all
      ("https://a.com/p?utm_source=x", "https://a.com/p"),
      // root path collapses to bare authority
      ("https://a.com/", "https://a.com"),
      // path case is PRESERVED (only scheme/host fold)
      ("https://A.com/CaseSensitive?Q=V", "https://a.com/CaseSensitive?Q=V"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in)")
    }
  }

  test("registrableDomain strips one www label and the port") {
    val got = Seq("https://WWW.news.example.org:443/a", "https://example.org/b",
        "https://www.www.x.com/c")
      .toDF("url").select(UrlOps.registrableDomain(col("url")))
      .collect().map(_.getString(0))
    assert(got.sameElements(Array("news.example.org", "example.org", "www.x.com")))
  }

  test("gopherRules: each rule fires independently; empty text is safe") {
    val docs = Seq(
      (1L, Array.fill(40)("the good word of it").mkString(" ")), // passes all
      (2L, "too short the a"),                                   // word-count floor
      (3L, Array.fill(40)("antidisestablishmentarianism " +
        "pneumonoultramicroscopicsilicovolcanoconiosis the a of").mkString(" ")), // mean wlen
      (4L, Array.fill(40)("the of a word### longish# wordies## tokens#").mkString(" ")), // symbol ratio
      (5L, Array.fill(40)("1234 5678 the word of list").mkString(" ")), // alpha fraction
      (6L, Array.fill(40)("word list with zero stop tokens").mkString(" ")), // stopwords
      (7L, ""))                                                  // degenerate
      .toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L))
  }

  test("filterReasons: every reason branch fires; first-failing-rule order; keep matches gopherRules") {
    val docs = Seq(
      (1L, Array.fill(40)("the good word of it").mkString(" ")),
      (2L, "too short the a"),
      (3L, Array.fill(40)("antidisestablishmentarianism " +
        "pneumonoultramicroscopicsilicovolcanoconiosis the a of").mkString(" ")),
      (4L, Array.fill(40)("the of a word### longish# wordies## tokens#").mkString(" ")),
      (5L, Array.fill(40)("1234 5678 the word of list").mkString(" ")),
      (6L, Array.fill(40)("word list with zero stop tokens").mkString(" ")),
      (7L, ""),
      // fails BOTH alpha and stopwords → must report alpha (earlier rule)
      (8L, Array.fill(40)("1234 5678 9012 3456").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.filterReasons(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> ((1L, "keep")), 2L -> ((0L, "too_few_words")),
      3L -> ((0L, "word_length")), 4L -> ((0L, "symbol_ratio")),
      5L -> ((0L, "alpha_ratio")), 6L -> ((0L, "stopwords")),
      7L -> ((0L, "too_few_words")), 8L -> ((0L, "alpha_ratio"))), got)
    // the keep flag is gopherRules' verdict verbatim
    val g = TextOps.gopherRules(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(got.view.mapValues(_._1).toMap == g)
  }

  test("luhnValid / ibanValid: published checksum vectors") {
    val df = Seq(
      "4111-1111-1111-1111", // Luhn-valid test card, dashed
      "4111 1111 1111 1112", // corrupted check digit
      "4111111111111111"     // same card unseparated
    ).toDF("s").select(TextOps.luhnValid(col("s")).as("ok"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, false, true))
    val ib = Seq(
      "DE89370400440532013000", // published ISO 13616 example
      "GB82WEST12345698765432", // letters inside the BBAN
      "DE89370400440532013001"  // one digit off
    ).toDF("s").select(TextOps.ibanValid(col("s")).as("ok"))
    assert(ib.collect().map(_.getBoolean(0)).toSeq == Seq(true, true, false))
  }

  test("luhnValid / ibanValid: randomized parity vs plain-Scala references") {
    // the Column implementations are higher-order-function folds whose
    // index/parity conventions are easy to get subtly wrong — pin them
    // against direct Scala spellings on seeded random inputs
    def luhnRef(s: String): Boolean = {
      val ds = s.filter(_.isDigit).reverse.map(_ - '0')
      ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 0) d else { val x = d * 2; if (x > 9) x - 9 else x }
      }.sum % 10 == 0
    }
    def ibanRef(s: String): Boolean = {
      val r = s.drop(4) + s.take(4)
      val digits = r.flatMap(c =>
        if (c >= 'A' && c <= 'Z') (c - 'A' + 10).toString else c.toString)
      digits.foldLeft(0L)((a, c) => (a * 10 + (c - '0')) % 97) == 1
    }
    val rnd = new scala.util.Random(42)
    val cards = (1 to 120).map { _ =>
      val groups = (1 to 4).map(_ => (1 to 4).map(_ => rnd.nextInt(10)).mkString)
      groups.mkString(if (rnd.nextBoolean()) "-" else " ")
    }
    val ibans = (1 to 120).map { _ =>
      val cc = s"${('A' + rnd.nextInt(26)).toChar}${('A' + rnd.nextInt(26)).toChar}"
      val chk = f"${rnd.nextInt(100)}%02d"
      val bban = (1 to (11 + rnd.nextInt(8))).map(_ =>
        if (rnd.nextInt(4) == 0) ('A' + rnd.nextInt(26)).toChar
        else ('0' + rnd.nextInt(10)).toChar).mkString
      s"$cc$chk$bban"
    }
    val got = cards.toDF("s")
      .select(col("s"), TextOps.luhnValid(col("s")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cards.foreach(c => assert(got(c) == luhnRef(c), s"luhn mismatch on $c"))
    val gotI = ibans.toDF("s")
      .select(col("s"), TextOps.ibanValid(col("s")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    ibans.foreach(c => assert(gotI(c) == ibanRef(c), s"iban mismatch on $c"))
    // and at least a few random IBANs should be valid by construction
    // chance is fine to be zero — validity is pinned by the published
    // vectors; this test is about PARITY on arbitrary shapes
  }

  test("redactPiiExtended: stage order — validated classes before the phone digit-run scrubber") {
    def red(t: String): String =
      Seq(t).toDF("text").select(TextOps.redactPiiExtended(col("text")))
        .head().getString(0)
    // valid card tagged as a card; Luhn-invalid card falls through to
    // the phone stage (scrubbed, coarser label) — the card-before-phone
    // ordering contract, the t10 IP-before-phone case one class over
    assert(red("pay 4111-1111-1111-1111 now") == "pay <CARD> now")
    assert(red("pay 4111-1111-1111-1112 now") == "pay <PHONE> now")
    // valid IBAN tagged; invalid IBAN's digit tail is a phone-run
    assert(red("acct DE89370400440532013000 ok") == "acct <IBAN> ok")
    assert(red("acct DE89370400440532013001 ok") == "acct DE<PHONE> ok")
    // SSN before phone; IP before phone (carried from t10)
    assert(red("ssn 123-45-6789 end") == "ssn <SSN> end")
    assert(red("ip 10.0.0.1 end") == "ip <IP> end")
    // all six classes in one line survive in order
    assert(red("u@x.io 10.0.0.1 4111-1111-1111-1111 DE89370400440532013000 123-45-6789 +1 (555) 123-0042")
      == "<EMAIL> <IP> <CARD> <IBAN> <SSN> <PHONE>")
    // no candidates: text unchanged
    assert(red("plain text, no pii") == "plain text, no pii")
  }

  test("piiCountsExtended: per-stage counts never double-count across classes") {
    val t = "u@x.io 10.0.0.1 4111-1111-1111-1111 4111-1111-1111-1112 DE89370400440532013000 123-45-6789 +1 (555) 123-0042"
    val row = Seq(t).toDF("text")
      .select(TextOps.piiCountsExtended(col("text")).map { case (n, c) => c.cast("long").as(n) }: _*)
      .head()
    // the invalid card is NOT an n_card; it lands in n_phone with the
    // injected phone number (2 phones total)
    assert(row.getLong(0) == 1L, "n_email")
    assert(row.getLong(1) == 1L, "n_ip")
    assert(row.getLong(2) == 1L, "n_card")
    assert(row.getLong(3) == 1L, "n_iban")
    assert(row.getLong(4) == 1L, "n_ssn")
    assert(row.getLong(5) == 2L, "n_phone")
  }

  test("distinctiveTerms: hand shares, hapax suppression, TopKPerKey plan (no Window)") {
    // source A: 'aaa' ×6 exclusive (share 10⁶), 'common' ×5 of 10 global
    // (share 5·10⁵); 'rare' ×2 is suppressed by minCount=5
    val docs = Seq(
      (1L, "A", ("aaa " * 6 + "common " * 5 + "rare rare").trim),
      (2L, "B", ("bbb " * 7 + "common " * 5).trim))
      .toDF("doc_id", "source", "text")
    val got = TextOps.distinctiveTerms(docs, k = 10, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("A", "aaa") -> ((6L, 6L, 1000000L)),
      ("A", "common") -> ((5L, 10L, 500000L)),
      ("B", "bbb") -> ((7L, 7L, 1000000L)),
      ("B", "common") -> ((5L, 10L, 500000L))), got)
    // k cuts per source under the total order, via the custom operator
    val top1 = TextOps.distinctiveTerms(docs, k = 1, minCount = 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top1 == Map("A" -> "aaa", "B" -> "bbb"), top1)
    val plan = TextOps.distinctiveTerms(docs, k = 1, minCount = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"),
      s"expected the custom operator, not window machinery:\n$plan")
  }

  test("domainMixture: largest-remainder quotas, caps, determinism") {
    import graft.ops.Sampling
    // domains a(w=3, 5 docs), b(w=1, 5 docs), c(w=1, 2 docs); total 7
    // W=5 → base = (7w) div 5 = a:4 r1, b:1 r2, c:1 r2 ; leftover 1 →
    // rank by (rem desc, name): b first → quotas a:4 b:2 c:1
    val docs = (
      (1L to 5L).map(i => (i, "a")) ++
      (11L to 15L).map(i => (i, "b")) ++
      (21L to 22L).map(i => (i, "c"))).toDF("doc_id", "domain")
    val w = when(col("domain") === "a", 3L).otherwise(1L)
    val got = Sampling.domainMixture(docs, "domain", w, total = 7L)
      .select("doc_id", "domain")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (11L, "b"), (12L, "b"), (21L, "c")))
    // cap: ask for more than c has → c yields its 2, total shrinks
    val capped = Sampling.domainMixture(docs, "domain", w, total = 12L)
      .select("domain").collect().map(_.getString(0))
    assert(capped.count(_ == "c") == 2)
  }

  test("collocationsPmi: hand-computed rationals; minCount kills the hapax pathology; TakeOrdered cut") {
    // corpus: "x y" always adjacent (perfect collocation), "a" common
    // and promiscuous, "q z" a hapax pair of hapax words
    val docs = Seq(
      (1L, "x y a x y a"), (2L, "a x y a a x y"), (3L, "x y a a q z"))
      .toDF("doc_id", "text")
    val got = TextOps.collocationsPmi(docs, k = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // N = 16 bigrams; c(x y) = 5, c_x = 5, c_y = 5 -> 5*16e6/25 = 3.2e6
    val xy = got.find(t => t._1 == "x" && t._2 == "y").get
    assert(xy == ("x", "y", 5L, 5L, 5L, 3200000L), xy.toString)
    // the hapax pair never appears despite maximal raw PMI
    assert(!got.exists(t => t._1 == "q" || t._2 == "z"),
      s"minCount must suppress hapax pairs: ${got.mkString("; ")}")
    // perfect collocation outranks every 'a' pairing
    assert(got.head._1 == "x" && got.head._2 == "y", got.head.toString)
    // the cutoff is a TakeOrdered, never a global sort
    val plan = TextOps.collocationsPmi(docs, k = 10, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrdered cut:\n$plan")
  }

  test("bigramLmScore: hand-computed counts; short docs score zero") {
    // corpus: "a b a b" (d1), "a b" (d2), "c" (d3)
    // unigrams: a:3 b:3 c:1, V=3
    // bigrams: (a,b):3, (b,a):1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // p(a,b) = (3+1)*1e6 div (3+3) = 666666; p(b,a) = (1+1)*1e6 div (3+3) = 333333
    // d1: (666666 + 333333 + 666666) div 3 = 555555 ; d2: 666666 ; d3: no bigrams
    assert(got(0) == ((1L, 3L, 555555L)))
    assert(got(1) == ((2L, 1L, 666666L)))
    assert(got(2) == ((3L, 0L, 0L)))
  }

  test("bpeMerges: hand-computed merge sequence, greedy application, deterministic ties") {
    // corpus: "aaab" x3, "aab" x2  (as repeated words in docs)
    // vocab: aaab:3 aab:2
    // iter1 pairs: (a,a): aaab has 2 overlapping + aab has 1 -> 2*3+1*2=8
    //              (a,b): 3+2=5  -> merge (a,a)->aa  [greedy: aaab->(aa,a,b), aab->(aa,b)]
    // iter2 pairs: (aa,a):3  (a,b):3  (aa,b):2
    //   tie 3==3 broken lexicographically: (a,b) < (aa,a) -> merge (a,b)->ab
    //   [aaab->(aa,ab); aab unchanged: (aa,b)]
    // iter3 pairs: (aa,ab):3  (aa,b):2 -> merge (aa,ab)->aaab
    val docs = Seq((1L, "aaab aaab aaab aab aab")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(docs, k = 3)
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got(0) == ((1L, "a", "a", "aa", 8L)))
    assert(got(1) == ((2L, "a", "b", "ab", 3L)))
    assert(got(2) == ((3L, "aa", "ab", "aaab", 3L)))
  }

  test("bpeEncode: applies learned merges greedily; whole-doc pass == per-word replay") {
    // same corpus as the merges test: after (a,a)->aa, (a,b)->ab,
    // (aa,ab)->aaab the word "aaab" is ONE symbol, "aab" is (aa, b)
    val docs = Seq(
      (1L, "aaab aaab aaab aab aab"), // 3·1 + 2·2 = 7 symbols
      (2L, "aaab"),                   // 1 symbol
      (3L, "aab b"),                  // (aa,b) + (b) = 3
      (4L, ""),                       // empty: 0 words, 0 symbols
      (5L, "  aaab   aab  ")          // whitespace runs squash; 1 + 2 = 3
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs.filter(col("doc_id") === 1L), k = 3)
      .collect().map(r => TextOps.BpeMerge(r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val got = TextOps.bpeEncode(docs, merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ((1L, 5L, 7L)))
    assert(got(1) == ((2L, 1L, 1L)))
    assert(got(2) == ((3L, 2L, 3L)))
    assert(got(3) == ((4L, 0L, 0L)))
    assert(got(4) == ((5L, 2L, 3L)))
  }

  test("bpeEncode: zero merges degenerates to non-whitespace char count; counts non-increasing in k") {
    val docs = Seq((1L, "abc de f"), (2L, "aaaa aaaa")).toDF("doc_id", "text")
    val k0 = TextOps.bpeEncode(docs, Seq.empty[TextOps.BpeMerge])
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(k0 == Map(1L -> 6L, 2L -> 8L))
    val learned = TextOps.bpeMerges(docs, k = 2).collect()
      .map(r => TextOps.BpeMerge(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    (0 to learned.size).foldLeft(Map.empty[Long, Long]) { (prev, k) =>
      val cur = TextOps.bpeEncode(docs, learned.take(k))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      if (prev.nonEmpty)
        cur.foreach { case (id, n) =>
          assert(n <= prev(id), s"subword count grew at doc $id, k=$k") }
      cur
    }
  }

  test("vocabCoverage: cutoff 1 covers everything; curve monotone; hand-checked counts") {
    // words: a:4, b:2, c:1  → total 7 occurrences
    val docs = Seq((1L, "a a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(docs, cutoffs = Seq(1L, 2L, 4L, 9L))
      .orderBy("cutoff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, 3L, 7L, 7L, 1000000L)))
    assert(got(1) == ((2L, 2L, 6L, 7L, 857142L))) // 6e6 div 7 truncates
    assert(got(2) == ((4L, 1L, 4L, 7L, 571428L)))
    assert(got.length == 3, "cutoff above max count yields no row (no word qualifies)")
    val micros = got.map(_._5)
    assert(micros.zip(micros.tail).forall { case (a, b) => b <= a },
      "coverage must be non-increasing in the cutoff")
  }

  test("bigramLmScoreAgainst: unseen transitions smooth at count 0, never drop") {
    val train = Seq((10L, "a b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    // train counts: c2(a,b)=1, c1(a)=1, c1(b)=1, V=2
    // doc 1: p(a,b) = (1+1)e6 div (1+2) = 666666; p(b,c) = 1e6 div 3 = 333333
    //        lm = (666666+333333) div 2 = 499999   (inner joins would say 666666)
    // doc 2: both words unseen: p(x,y) = 1e6 div (0+2) = 500000
    val got = TextOps.bigramLmScoreAgainst(score, train)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ((1L, 2L, 499999L)),
      s"unseen transition must average in smoothed, got ${got(0)}")
    assert(got(1) == ((2L, 1L, 500000L)))
  }

  test("dsirWeights: target-typical docs score positive, off-target negative; self-delegate intact") {
    // target domain: docs that repeat "spark sql"; off-target: "cat dog"
    val docs = Seq(
      (1L, "spark sql spark sql spark"), (2L, "spark sql spark"),
      (3L, "cat dog cat dog cat"), (4L, "spark sql cat")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2L)
    val w = TextOps.dsirWeights(docs, target)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(w(1L) > 0L && w(2L) > 0L, s"in-domain docs must weigh positive: $w")
    // the robust DSIR claim on a toy corpus is the RANKING: in-domain
    // strictly above off-target (absolute signs shift with smoothing
    // mass when the target vocab is tiny)
    assert(w(1L) > w(3L) && w(2L) > w(3L),
      s"in-domain docs must outrank the off-target doc: $w")
    // the self-trained delegate is unchanged semantics: importance of
    // docs against themselves is identically zero
    val self = TextOps.dsirWeights(docs, docs)
      .agg(max(abs(col("importance_micro")))).head().getLong(0)
    assert(self == 0L)
  }

  test("lmTypicalityBuckets: distributed rank assembly == literal ntile; tiny-language edge") {
    import org.apache.spark.sql.expressions.Window
    // en: 5 docs with a score TIE (identical texts) — exercises the
    // tie row_number path; fr: 2 docs < nBuckets — exercises the
    // q = 0 arm of the bucket arithmetic; de: singleton
    val docs = Seq(
      (1L, "a b a b", "en"), (2L, "a b a b", "en"), (3L, "a b c d", "en"),
      (4L, "x y", "de"), (5L, "p q r s t", "en"), (6L, "a a a a", "en"),
      (7L, "z", "fr"), (8L, "z z", "fr")).toDF("doc_id", "text", "lang")
    val got = TextOps.lmTypicalityBuckets(docs, nBuckets = 3)
      .orderBy("doc_id").collect().toSeq
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(TextOps.bigramLmScore(docs).select(col("doc_id"), col("lm_micro")),
        Seq("doc_id"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lm_micro").desc, col("doc_id"))
    val want = scored
      .select(col("doc_id"), col("lang"), col("lm_micro"),
        ntile(3).over(w).cast("long").as("bucket"))
      .orderBy("doc_id").collect().toSeq
    assert(got == want)
  }

  private def extract(html: String): String =
    Seq(html).toDF("html")
      .select(TextOps.htmlToText(col("html"))).collect()(0).getString(0)

  test("htmlToText: script/style/comment BLOCKS vanish wholesale, tags strip, text survives") {
    val html = "<html><head><style>body { a > b; }</style>" +
      "<script>if (1 < 2) { var s = \"<p>leak</p>\"; }</script></head>" +
      "<body><!-- note --><p class=\"x\">hello <b>world</b></p></body></html>"
    assert(extract(html) == "hello world")
    // tag-strip alone would have leaked "leak" / "b; }" — pin absence
    assert(!extract(html).contains("leak"))
  }

  test("htmlToText: entity battery — named core, decimal Latin-1, amp LAST, malformed kept") {
    assert(extract("Tom&nbsp;&amp; Jerry") == "Tom & Jerry")
    assert(extract("&lt;b&gt; is text") == "<b> is text")          // escaped markup IS content
    assert(extract("&#65;&#66;&#169;") == "AB©")              // decimal decode incl. non-ASCII
    assert(extract("&amp;lt;") == "&lt;")                          // amp decodes LAST (no double decode)
    assert(extract("keep &#999; &#; x&# tail") == "keep &#999; &#; x&# tail") // out-of-range + malformed intact
    assert(extract("a&#10;b") == "a b")                            // decoded newline joins the collapse
  }

  test("htmlLinks: order, case, whitespace, empty href kept, all three value spellings") {
    def links(html: String): Seq[String] =
      Seq(html).toDF("h").select(TextOps.htmlLinks(col("h")).as("l"))
        .collect()(0).getSeq[String](0)
    val html = "<html><a href=\"https://a.com/1\">x</a>" +
      "<a class=\"z\" HREF = \"https://b.com/2\">y</a>" +
      "<a href=\"\">empty</a>" +
      "<a href='https://single.quote/3'>single-quoted</a>" +
      "<a href=https://unquoted.example/4?a=1 rel=nofollow>unquoted stops at whitespace</a>" +
      "<a href=https://unquoted.example/5>unquoted stops at the tag close</a>" +
      "<a href=''>single-quoted empty</a>" +
      "<p href=\"https://not-an-anchor.com\">p is not a</p></html>"
    assert(links(html) == Seq("https://a.com/1", "https://b.com/2", "",
      "https://single.quote/3", "https://unquoted.example/4?a=1",
      "https://unquoted.example/5", ""))
    assert(links("no anchors here") == Seq.empty)
    // a double-quoted value may CONTAIN a single quote and vice versa —
    // only the matching delimiter closes it
    assert(links("<a href=\"https://a.com/it's\">q</a>") == Seq("https://a.com/it's"))
  }

  test("phraseOccurrences: sliding-window overlap counting, case, single word, hitless docs absent") {
    def hits(docs: Seq[(Long, String)], phrase: Seq[String]): Map[Long, (Long, Long)] =
      TextOps.phraseOccurrences(docs.toDF("doc_id", "text"), phrase)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Seq(
      (1L, "the quick Brown fox and the brown fox again"),
      (2L, "a a a a"),            // overlapping "a a": 3 sliding hits
      (3L, "brown nothing fox"),  // words present, sequence absent
      (4L, ""))                   // empty doc: no rows
    assert(hits(docs, Seq("Brown", "FOX")) ==
      Map(1L -> ((2L, 2L))), "case-insensitive, both occurrences, first at 2")
    assert(hits(docs, Seq("a", "a")) == Map(2L -> ((3L, 0L))),
      "overlaps all count")
    assert(hits(docs, Seq("fox")) ==
      Map(1L -> ((2L, 3L)), 3L -> ((1L, 2L))), "single-word phrase")
    assert(hits(docs, Seq("missing", "phrase")).isEmpty)
  }

  test("dropDomainBoilerplate: per-domain keying, cross-domain twins kept, pure-chrome docs survive, stale df conservative") {
    // "nav" repeats in 3 docs of d1 (dropped there) but only 2 of d2
    // (kept there) — the per-domain key is what decides, not the text
    val lines = Seq(
      (1L, "d1", 0, "nav"), (1L, "d1", 1, "body one"),
      (2L, "d1", 0, "nav"), (2L, "d1", 1, "body two"),
      (3L, "d1", 0, "nav"),                    // pure chrome: survives empty
      (4L, "d2", 0, "nav"), (4L, "d2", 1, "body four"),
      (5L, "d2", 0, "nav")
    ).toDF("doc_id", "domain", "pos", "line")
    val out = TextOps.dropDomainBoilerplate(lines, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("body one", 2L, 1L)), out(1L))
    assert(out(3L) == (("", 1L, 1L)), "pure-boilerplate doc must survive, empty")
    assert(out(4L) == (("nav\nbody four", 2L, 0L)),
      "a line under the domain's threshold must be kept")
    assert(out(5L) == (("nav", 1L, 0L)))
    // a stale df table missing a line keeps it (unknown = df 1)
    val stale = Seq(("d1", "nav", 5L)).toDF("domain", "line", "line_df")
    val cons = TextOps.dropDomainBoilerplate(lines, minDf = 3, dfTable = Some(stale))
      .filter(col("doc_id") === 1L).collect()(0)
    assert(cons.getString(2) == "body one" && cons.getLong(4) == 1L)
  }

  test("proximityOccurrences: unordered window, edge-inclusive, all pairs count, hitless docs absent") {
    def near(docs: Seq[(Long, String)], a: String, b: String, w: Int): Map[Long, (Long, Long)] =
      TextOps.proximityOccurrences(docs.toDF("doc_id", "text"), a, b, w)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Seq(
      (1L, "alpha x beta"),      // span 2 == window: edge is INCLUSIVE
      (2L, "alpha x x beta"),    // span 3 > window: filtered
      (3L, "beta alpha"),        // unordered: b-before-a still pairs
      (4L, "alpha x beta alpha"),// pairs (0,2) and (3,2): both count
      (5L, ""))                  // empty doc: no rows
    assert(near(docs, "ALPHA", "Beta", 2) == Map(
      1L -> ((1L, 2L)), 3L -> ((1L, 1L)), 4L -> ((2L, 1L))),
      near(docs, "ALPHA", "Beta", 2))
    // widening the window admits doc 2
    assert(near(docs, "alpha", "beta", 3).keySet == Set(1L, 2L, 3L, 4L))
    // degenerate parameters fail loudly
    intercept[IllegalArgumentException] {
      TextOps.proximityOccurrences(docs.toDF("doc_id", "text"), "x", "X", 2)
    }
    intercept[IllegalArgumentException] {
      TextOps.proximityOccurrences(docs.toDF("doc_id", "text"), "a", "b", 0)
    }
  }

  test("pageTitle/pageMetaDescription/pageCanonical: first match wins, decoys skipped, no-match is ''") {
    def meta(html: String): (String, String, String) =
      Seq(html).toDF("h").select(
        TextOps.pageTitle(col("h")), TextOps.pageMetaDescription(col("h")),
        TextOps.pageCanonical(col("h")))
        .as[(String, String, String)].collect()(0)
    val full = "<html><head><meta charset=\"utf-8\">" +
      "<meta name=\"keywords\" content=\"skip,me\">" + // decoy: wrong name
      "<title id=\"x\">First Title</title>" +
      "<meta name=\"description\" content=\"the summary\">" +
      "<link rel=\"stylesheet\" href=\"/skip.css\">" + // decoy: wrong rel
      "<link rel=\"canonical\" href=\"https://a.com/c\">" +
      "</head><body><title>second title</title></body></html>"
    assert(meta(full) == (("First Title", "the summary", "https://a.com/c")))
    // nothing present → '' everywhere, never NULL
    assert(meta("<html><body>plain</body></html>") == (("", "", "")))
    // empty title element is a match with empty text
    assert(meta("<title></title>")._1 == "")
    // messy-attribute spellings: single-quoted name+content, unquoted
    // rel and href — all three value forms land on the same fields
    val messy = "<head><meta name='description' content='single quoted'>" +
      "<link rel=canonical href=https://a.com/u></head>"
    assert(meta(messy) == (("", "single quoted", "https://a.com/u")))
    val mixed = "<head><meta name=\"description\" content='mix &amp; match'>" +
      "<link rel='canonical' href=\"https://a.com/m\"></head>"
    assert(meta(mixed) == (("", "mix &amp; match", "https://a.com/m")))
  }

  test("htmlAnchorElements: href/text split, order, case, nested-markup boundary") {
    def anchors(html: String): Seq[(String, String)] =
      Seq(html).toDF("h")
        .select(explode(TextOps.htmlAnchorElements(col("h"))).as("e"))
        .select(TextOps.anchorHref(col("e")), TextOps.anchorText(col("e")))
        .as[(String, String)].collect().toSeq
    val html = "<html><a href=\"https://a.com/1\">First Link</a>" +
      "<a class=\"z\" HREF = \"https://b.com/2\">second</a>" +
      "<a href=\"\">skip me</a>" + // empty href: extracted, caller filters
      "<a href=\"https://c.com\"><b>nested</b></a>" + // boundary: body has markup
      "<p href=\"https://not-an-anchor.com\">p is not a</p></html>"
    assert(anchors(html) == Seq(
      ("https://a.com/1", "First Link"),
      ("https://b.com/2", "second"),
      ("", "skip me")))
    assert(anchors("no anchors") == Seq.empty)
    // empty body is a legitimate anchor
    assert(anchors("<a href=\"u\"></a>") == Seq(("u", "")))
    // messy-attribute spellings carry their bodies too
    assert(anchors("<a href='https://s.com/1'>sq body</a>" +
      "<a href=https://u.com/2 rel=x>uq body</a>") ==
      Seq(("https://s.com/1", "sq body"), ("https://u.com/2", "uq body")))
  }

  test("sentences: terminator runs attach, remnant kept, empties dropped, plain text is one sentence") {
    def seg(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextOps.sentences(col("t")).as("s"))
        .collect()(0).getSeq[String](0)
    assert(seg("One. Two! Three?") == Seq("One.", "Two!", "Three?"))
    assert(seg("Wait... what?! done") == Seq("Wait...", "what?!", "done")) // runs attach; remnant kept
    assert(seg("no terminator at all") == Seq("no terminator at all"))
    assert(seg("a.b.c") == Seq("a.", "b.", "c")) // no-space boundaries still split
    assert(seg("...") == Seq.empty) // pure terminators: no content, no sentence
    assert(seg("") == Seq.empty)
    assert(seg("  spaced out.  ") == Seq("spaced out.")) // trimmed
  }

  test("tokenizer artifact: write/read round trip, case contract, serve == from-scratch, loud non-tokenizer") {
    val docs = Seq((1L, "Low low lower lowest"), (2L, "low lower newer new"),
      (3L, "wider wide low")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_tok_spec")
    val p = root.resolve("tok").toString
    TextOps.writeTokenizer(docs, p, k = 4)
    assert(TextOps.isTokenizer(spark, p))
    val (merges, lowercase) = TextOps.readTokenizer(spark, p)
    assert(lowercase && merges.size == 4 && merges.map(_.step) == Seq(1L, 2L, 3L, 4L))
    // the artifact IS the training result: replaying it equals train+encode
    val served = TextOps.bpeEncodeIndexed(spark, p, docs).orderBy("doc_id").collect().toSeq
    val scratch = TextOps.bpeTrainEncode(docs, k = 4).orderBy("doc_id").collect().toSeq
    assert(served == scratch)
    // the case-folding contract survives the round trip: a
    // lowercase=false tokenizer must NOT fold at serve time (the
    // capitalized 'Low' stays a distinct symbol sequence)
    val pCase = root.resolve("tok_case").toString
    TextOps.writeTokenizer(docs, pCase, k = 4, lowercase = false)
    val servedCase = TextOps.bpeEncodeIndexed(spark, pCase, docs).orderBy("doc_id").collect().toSeq
    val scratchCase = TextOps.bpeTrainEncode(docs, k = 4, lowercase = false)
      .orderBy("doc_id").collect().toSeq
    assert(servedCase == scratchCase)
    assert(!TextOps.readTokenizer(spark, pCase)._2)
    // not-a-tokenizer fails loudly, never serves garbage
    val bare = root.resolve("bare").toString
    docs.write.mode("overwrite").parquet(bare)
    intercept[IllegalArgumentException] {
      TextOps.bpeEncodeIndexed(spark, bare, docs)
    }
  }

  test("langIdByLine + dropMinorityLanguageLines: majority ties, mixed flag, byte-identical pass-through") {
    val docs = Seq(
      // 2-line tie en/de → larger lang code wins ('en'); the de line drops
      (1L, "the and of is\nder die und ist"),
      // 2-line tie en/fr → 'fr' wins; the ENGLISH line drops
      (2L, "the and of is\nle la les est"),
      // 3 lines, fr majority 2-1 → the en line drops
      (3L, "the and of\nle la les est\nest et dans le"),
      // single line → unmixed, byte-identical pass-through
      (4L, "plain single line the"),
      // no markers anywhere → every line defaults 'en', nothing drops
      (5L, "xyz qqq\nzzz www")).toDF("doc_id", "text")
    val seg = TextOps.langIdByLine(docs)
    val byDoc = seg.select("doc_id", "doc_lang", "is_mixed").distinct()
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(byDoc(1L) == (("en", true)))
    assert(byDoc(2L) == (("fr", true)))
    assert(byDoc(3L) == (("fr", true)))
    assert(byDoc(4L) == (("en", false)))
    assert(byDoc(5L) == (("en", false)))
    val cleaned = TextOps.dropMinorityLanguageLines(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("cleaned"), r.getAs[Long]("n_dropped")))).toMap
    assert(cleaned(1L) == (("the and of is", 1L)))
    assert(cleaned(2L) == (("le la les est", 1L)))
    assert(cleaned(3L) == (("le la les est\nest et dans le", 1L)))
    assert(cleaned(4L) == (("plain single line the", 0L)))
    assert(cleaned(5L) == (("xyz qqq\nzzz www", 0L)))
  }

  test("htmlToText: whitespace collapses; plain text is a fixed point") {
    assert(extract("  a\t\tb\n\nc  ") == "a b c")
    val plain = "already clean text with words"
    assert(extract(plain) == plain)
    // idempotence on its own output (no markup survives one pass)
    assert(extract(extract("<p>x &amp; y</p>")) == extract("<p>x &amp; y</p>"))
  }
}
