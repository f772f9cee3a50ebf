package graft.examples

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ext.{Dedup, TextOps}

/** The COMPLETE training-data curation pipeline as one executable
  * narrative — every stage a graft operator, chained the way a 100 TB
  * curation job runs them:
  *
  *   raw HTML pages → text extraction → PII redaction → language ID
  *   → boilerplate-line
  *   removal → Gopher rule battery → quality / OOV / repetition
  *   filters → exact dedup → near-dup clusters (keep one) →
  *   decontamination vs a held-out eval set → BM25 retrieval for
  *   targeted review → deterministic train/val/test split → bigram-LM
  *   typicality report → largest-remainder domain mixture →
  *   token-budget shard packing → heavy-hitter vocabulary profile →
  *   persisted minhash index for the NEXT ingest batch → edit-distance
  *   metadata reconciliation → KMV sketch survival estimate.
  *
  * Run: `sbt "runMain graft.examples.CurationTour"` — prints one
  * OK/FAIL line per stage and exits nonzero on any FAIL. Every stage is
  * deterministic, so the final train set is bit-reproducible.
  */
object CurationTour {
  def main(args: Array[String]): Unit = {
    implicit val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var failed = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch { case e: Throwable => println(s"  ! $name: $e"); false }
      println(f"${if (ok) "OK  " else "FAIL"} $name")
      if (!ok) failed += 1
    }

    // 0. HTML → text: the tour now starts where a crawl pipeline does —
    // each doc wrapped in a deterministic page skeleton (head with
    // script/style blocks, tags, comments, entities), then extracted
    // back ([[TextOps.htmlToText]]). The fixture text is already
    // whitespace-normalized plain text, so extraction must be a perfect
    // round trip — any leak from a script block, a tag fragment, or a
    // broken entity decode fails the equality check on some doc.
    // Doc-id-bearing junk lives ONLY in removed blocks (script,
    // comment); the body's entity footer is CONSTANT, so duplicate
    // documents stay duplicates for every downstream dedup stage.
    val pages = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      col("source"),
      concat(lit("<!DOCTYPE html><html><head><style>p { x > y; }</style>"),
        lit("<script>var t = \"<p>leak d"), col("doc_id"), lit("</p>\";</script>"),
        lit("</head><body><!-- c d"), col("doc_id"), lit(" --><p>"), col("text"),
        lit("</p><p>&amp; &#169;</p><a href=\"HTTPS://WWW.Example.com:443/r/"),
        col("doc_id"), lit("/\"></a></body></html>")).as("html"),
      col("text").as("text0")).cache()
    // -1. WARC ingestion ([[TextOps.warcRecords]]): a crawl pipeline
    // does not receive pages, it receives container FILES — each page
    // arrives framed as a response record behind a warcinfo record,
    // and the tour's first operator is the Content-Length byte walk.
    // Everything downstream consumes the PARSED payload (a mis-framed
    // walk would fail every later stage), and the explicit check pins
    // record counts and byte-identity of payload vs the framed page.
    val crlf = "\r\n"
    val container = pages.select(col("doc_id"), col("lang"), col("source"),
      col("text0"),
      concat(
        lit("WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf +
          "Content-Length: 15" + crlf + crlf + "software: graft" + crlf + crlf),
        lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
          "WARC-Target-URI: https://www.example.com/r/"), col("doc_id"),
        lit(crlf + "Content-Length: "), octet_length(col("html")).cast("string"),
        lit(crlf + crlf), col("html"), lit(crlf + crlf)).as("warc"))
    val recs = TextOps.warcRecords(container).cache()
    val nPages = pages.count()
    check("WARC ingestion: the framed walk recovers every response payload byte-identically") {
      recs.count() == 2 * nPages &&
        recs.filter(col("rec_type") === "response").count() == nPages &&
        recs.filter(col("rec_type") === "response")
          .join(pages.select(col("doc_id"), col("html")), "doc_id")
          .filter(col("payload") =!= col("html")).count() == 0
    }
    val pagesIn = recs.filter(col("rec_type") === "response")
      .select(col("doc_id"), col("lang"), col("source"),
        col("payload").as("html"), col("text0"))

    val raw = pagesIn.select(col("doc_id"), col("lang"), col("source"),
      TextOps.htmlToText(col("html")).as("text"), col("text0")).cache()
    val n0 = raw.count()
    check("HTML extraction round-trips every doc's body text and leaks no markup") {
      raw.filter(col("text") =!= concat(col("text0"), lit(" & ©"))).count() == 0 &&
        raw.filter(col("text").contains("leak") || col("text").contains("<")).count() == 0
    }

    // 0'. the OTHER half of page processing: harvest each page's anchor
    // into the crawl frontier — extraction, canonicalization (scheme/
    // host case, default port, trailing slash) and registrable domain
    // must land every link on the one expected frontier entry
    check("link frontier: every page's anchor canonicalizes to its exact frontier entry") {
      val canon = graft.ext.UrlOps.canonicalizeUrl(col("href"))
      val frontier = pages
        .select(col("doc_id"), explode(TextOps.htmlLinks(col("html"))).as("href"))
        .select(col("doc_id"), canon.as("u"),
          graft.ext.UrlOps.registrableDomain(canon).as("d"))
      frontier.count() == n0 &&
        frontier.filter(col("d") =!= "example.com").count() == 0 &&
        frontier.filter(col("u") =!=
          concat(lit("https://www.example.com/r/"), col("doc_id"))).count() == 0
    }

    // 0'b. the RE-CRAWL loop: rank the first snapshot into a persisted
    // artifact, warm-update it when a delta batch discovers a new
    // domain ([[graft.ops.RankIndex]] — never a from-uniform
    // reconvergence), then schedule refetches by freshness × the
    // SERVED authority (the t66 arithmetic): a stale page loses its
    // slot to fresh ones whatever its domain's rank
    check("re-crawl loop: warm rank update == cold continuation; stale page schedules last") {
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("curation_rank")
        .toFile.getAbsolutePath + "/ri"
      val e1 = Seq(("a.com", "b.org", 3L), ("b.org", "a.com", 1L),
        ("a.com", "c.net", 1L)).toDF("src", "dst", "w")
      val n1 = Seq("a.com", "b.org", "c.net").toDF("id")
      graft.ops.RankIndex.writeRankIndex(n1, e1, root, iters = 2)
      // the next crawl batch discovers d.io linked from a.com
      val e2 = e1.union(Seq(("a.com", "d.io", 2L)).toDF("src", "dst", "w"))
      val n2 = n1.union(Seq("d.io").toDF("id"))
      graft.ops.RankIndex.updateRankIndex(spark, root, n2, e2, iters = 2)
      val served = graft.ops.RankIndex.ranksAt(spark, root)
      val cold = graft.ops.Graph.pageRankWeightedFrom(n2, e2,
        graft.ops.Graph.pageRankWeighted(n1, e1, iters = 2), iters = 2)
      val same = served
        .join(cold.withColumnRenamed("rank", "r2"), "id")
        .filter(col("rank") =!= col("r2")).isEmpty
      val entries = Seq(
        ("a.com", "https://a.com/p1", "2026-09-30"),
        ("a.com", "https://a.com/p2", "2026-01-01"),
        ("d.io", "https://d.io/p1", "2026-09-29"))
        .toDF("domain", "url_canon", "lastmod")
      val aged = entries.select(col("domain"), col("url_canon"),
        greatest(datediff(to_date(lit("2026-10-01")),
          to_date(col("lastmod"))), lit(0)).cast("long").as("age_days"))
      val ord = aged
        .join(served.withColumnRenamed("id", "domain"), Seq("domain"))
        .withColumn("priority", expr("(rank * 1000) div (age_days + 1)"))
        .orderBy(col("priority").desc)
        .select("url_canon").collect().map(_.getString(0))
      same && served.count() == 4 && ord.length == 3 &&
        ord.last == "https://a.com/p2"
    }

    // 0''. domain-scoped chrome removal
    // ([[TextOps.dropDomainBoilerplate]]): a crawl page carries its
    // SITE's navigation/footer, which repeats within the domain and
    // nowhere else — the (domain, line) df key removes it without a
    // prose-eating global threshold. The check wraps each extracted
    // page in per-source chrome (source standing in for the domain),
    // strips it, and pins: chrome never survives, and every doc whose
    // prose is UNIQUE within its source round-trips exactly (duplicate
    // prose may legitimately cross the in-domain threshold too — the
    // operator's contract, not a bug, so those docs are exempted).
    check("domain chrome strips on the (domain, line) key and unique prose round-trips") {
      val chromed = raw.select(col("doc_id"), col("source").as("domain"),
        col("text"),
        concat(lit("Home | About "), col("source"), lit("\n"), col("text"),
          lit("\n(c) "), col("source")).as("page"))
      val lines = chromed.select(col("doc_id"), col("domain"),
          posexplode(org.apache.spark.sql.functions.split(col("page"), "\n")))
        .withColumnRenamed("col", "line")
      val cleaned = TextOps.dropDomainBoilerplate(lines, minDf = 3).cache()
      val uniqProse = raw.groupBy(col("source"), col("text"))
        .agg(count(lit(1)).as("c")).filter(col("c") === 1)
        .join(raw.select(col("doc_id"), col("source"), col("text")),
          Seq("source", "text"))
        .select(col("doc_id"), col("text"))
      val ok = cleaned.count() == n0 &&
        cleaned.filter(col("n_removed") < 2L).count() == 0 &&
        cleaned.filter(col("cleaned").contains("Home | About") ||
          col("cleaned").contains("(c) ")).count() == 0 &&
        cleaned.join(uniqProse, "doc_id")
          .filter(col("cleaned") =!= col("text")).count() == 0
      cleaned.unpersist()
      ok
    }

    // 1. scrub: redact PII in place, count what was touched
    val scrubbed = raw.select(col("doc_id"), col("lang"),
      TextOps.redactPii(col("text")).as("text"),
      TextOps.piiCount(col("text")).as("n_pii")).cache()
    check("redaction preserves every row and is idempotent") {
      scrubbed.count() == n0 &&
        scrubbed.filter(TextOps.piiCount(col("text")) =!= 0).count() == 0
    }

    // 1'. the EXTENDED chain (r14: checksum-validated cards/IBANs,
    // SSNs) on the consumer path too: idempotent — placeholders carry
    // no digits and checksum-failed remnants already fell through to
    // the phone scrubber, so a second pass finds nothing — and the
    // per-class counts on already-clean text are all zero
    check("extended redaction (cards/IBANs/SSNs) is idempotent with zero residual counts") {
      val ext = raw.select(col("doc_id"),
        TextOps.redactPiiExtended(col("text")).as("text")).cache()
      val countsClean = ext.select(
        TextOps.piiCountsExtended(col("text"))
          .map { case (nm, c) => c.cast("long").as(nm) }: _*)
        .agg(sum(col("n_email") + col("n_ip") + col("n_card") +
          col("n_iban") + col("n_ssn") + col("n_phone")).as("tot"))
        .head().getLong(0)
      val stable = ext
        .filter(TextOps.redactPiiExtended(col("text")) =!= col("text"))
        .count() == 0
      ext.unpersist()
      countsClean == 0L && stable
    }

    // 1a. language ID: tag every doc with the marker-heuristic code —
    // the gate real pipelines filter on before any language-specific
    // stage (the fixture's text is English-shaped whatever its label,
    // so this tags and checks rather than drops)
    val langTagged = scrubbed.withColumn("lang_pred", TextOps.langId(col("text")))
    check("language ID tags every doc with a known code") {
      langTagged.count() == n0 &&
        langTagged.filter(!col("lang_pred")
          .isin(TextOps.LangMarkers.keys.toSeq: _*)).count() == 0
    }

    // 1a'. per-line language segmentation (CCNet-style): real crawl
    // docs are multi-line and mixed-language — inject a German marker
    // line on every seventh doc, score PER LINE, and require (a) the
    // mixed flag fires on exactly the injected docs, (b) the injected
    // line classifies 'de' while the body line keeps its own label,
    // (c) single-line docs' majority label agrees with the whole-doc
    // tagger (the two operators must not drift apart)
    check("per-line language ID flags exactly the injected mixed docs; majority tracks the doc tagger") {
      val withLines = scrubbed.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit("\nder und die ist mit nicht")))
          .otherwise(col("text")).as("text"))
      val seg = TextOps.langIdByLine(withLines).cache()
      val mixed = seg.filter(col("is_mixed")).select("doc_id").distinct()
      val injected = scrubbed.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select("doc_id")
      val flagsExact = mixed.exceptAll(injected).isEmpty &&
        injected.exceptAll(mixed).isEmpty
      val injectedLineDe = seg.filter(col("pos") === 1)
        .filter(col("line_lang") =!= "de").count() == 0
      val singleAgrees = seg.filter(!col("is_mixed"))
        .join(langTagged.select(col("doc_id"), col("lang_pred")), "doc_id")
        .filter(col("doc_lang") =!= col("lang_pred")).count() == 0
      seg.unpersist()
      flagsExact && injectedLineDe && singleAgrees
    }

    // 1b. strip corpus-level boilerplate lines (C4-style), windowed
    // segmentation since the fixture is a flat token stream
    val lineCleaned = TextOps.dropBoilerplateLines(
        TextOps.linesByTokenWindow(scrubbed, tokensPerLine = 8), minDf = 3, sep = " ")
      .withColumnRenamed("cleaned", "text")
      .join(scrubbed.select("doc_id", "lang"), "doc_id").cache()
    check("boilerplate-line removal fires on the fixture and only ever shrinks text") {
      lineCleaned.count() == n0 &&
        lineCleaned.filter(col("n_removed") > 0).count() > 0 &&
        lineCleaned.join(scrubbed.select(col("doc_id"), length(col("text")).as("len0")), "doc_id")
          .filter(length(col("text")) > col("len0")).count() == 0
    }

    // 1c. Gopher rule battery — the cheap structural pre-filter that
    // runs before any scoring: word-count floor, mean word length,
    // symbol ratio, alpha fraction, stopword presence. Integer
    // micro-unit metrics, keep = all five rules
    val gopher = TextOps.gopherRules(lineCleaned).cache()
    val gopherKept = lineCleaned
      .join(gopher.filter(col("keep") === 1L).select("doc_id"), "doc_id")
      .cache()
    check("Gopher rules keep a nonempty strict subset; every keeper clears the word floor") {
      val k = gopherKept.count()
      k > 0 && k < n0 &&
        gopher.filter(col("keep") === 1L && col("n_words") < 30).count() == 0
    }

    // 2. filter: quality floor, OOV ceiling, repetition ceiling — over
    // the GOPHER-KEPT cleaned text: the narrative is a chain, each
    // stage consumes the previous stage's output
    val quality = gopherKept.withColumn("quality", TextOps.qualityScore(col("text")))
    val oov = TextOps.oovRate(gopherKept, topK = 10)
    val rep = TextOps.repetitionRatio(gopherKept, n = 3)
    val filtered = quality.filter(col("quality") >= 0.1)
      .join(oov.filter(col("oov_rate") <= 0.95).select("doc_id"), "doc_id")
      .join(rep.filter(col("dup_ratio") <= 0.5).select("doc_id"), "doc_id")
      .cache()
    check("quality/OOV/repetition filters keep a nonempty strict subset") {
      val k = filtered.count(); k > 0 && k <= n0
    }

    // 3. dedup: exact first (cheap), then near-dup clusters keep-one
    val exactKept = Dedup.dropExactDuplicates(filtered)
    val pairs = Dedup.minhashDedupPairs(exactKept, n = 3, k = 32, bands = 16,
      minJaccard = 0.5)
    val deduped = Dedup.dropNearDuplicates(exactKept, pairs).cache()
    check("dedup keeps one representative per near-dup group") {
      deduped.count() == exactKept.count() -
        Dedup.clusters(pairs).filter(col("id") =!= col("cluster_id")).count()
    }

    // 3a. the pair graph as a PERSISTED artifact: the single most
    // expensive intermediate of the chain is computed once per corpus
    // snapshot; clustering, representative selection, and any graph
    // analytics read the artifact instead of re-deriving it per policy
    check("pair-graph artifact: persisted once, consumed by clusters and reps") {
      val pgDir = java.nio.file.Files.createTempDirectory("curation_pairs")
        .toFile.getAbsolutePath
      Dedup.writePairGraph(exactKept, s"$pgDir/pairs", n = 3, minJaccard = 0.5)
      val art = Dedup.readPairGraph(spark, s"$pgDir/pairs")
      val labels = Dedup.clusters(art).cache()
      val reps = Dedup.clusterRepresentatives(exactKept, art)
      // sidecar round-trips the build parameters; one representative row
      // per cluster; member counts sum back to every clustered id
      Dedup.readPairGraphParams(spark, s"$pgDir/pairs")
        .contains(Dedup.PairGraphParams("jaccard", 3, 0.5)) &&
        reps.count() == labels.select("cluster_id").distinct().count() &&
        reps.agg(sum("n_members")).head().getLong(0) == labels.count()
    }

    // 3b. the artifact EVOLVES with the corpus, and the SNAPSHOT DIFF
    // drives it: corpusDiff classifies the new snapshot's rows, the
    // added∪changed set folds in as the ingest batch (only
    // batch-touching pairs are computed — the corpus never re-pairs
    // against itself), the removed set propagates as a takedown. Both
    // mutations land through the fuse-guarded atomic swap, and the end
    // state must equal the from-scratch rebuild of the new snapshot.
    check("pair-graph lifecycle: ingest + takedown == rebuild; labeling folds at batch cost") {
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pgDir = java.nio.file.Files.createTempDirectory("curation_pairs_life")
        .toFile.getAbsolutePath
      val p = s"$pgDir/pairs"
      val snapA = exactKept.select(col("doc_id"), col("text"))
      // snapshot B: some docs gone, some texts amended, some new docs
      val snapB = snapA.filter(col("doc_id") % 13 =!= 1)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" amended copy")))
            .otherwise(col("text")).as("text"))
        .unionByName(snapA.filter(col("doc_id") % 17 === 2)
          .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
      Dedup.writePairGraph(snapA, p, n = 3, minJaccard = 0.5)
      val diff = Dedup.corpusDiff(snapA, snapB).cache()
      val batch = snapB.join(
        diff.filter(col("status").isin("added", "changed")).select("doc_id"),
        Seq("doc_id"))
      val removed = diff.filter(col("status") === "removed").select("doc_id")
      // order matters only for cost: forget first so the batch never
      // re-pairs against rows the diff already declared gone
      Dedup.forgetDocs(spark, p, removed)
      Dedup.updatePairGraph(batch, snapA.join(removed, Seq("doc_id"), "left_anti"), p)
      val artifactOk = pairSet(Dedup.readPairGraph(spark, p)) ==
        pairSet(Dedup.ngramJaccardPairs(snapB, 3, 0.5))
      // the labeling follows the artifact at batch cost too: fold the
      // batch-touching pairs into snapshot A's labeling and compare
      // with a full re-cluster of the updated graph
      val bIds = batch.select(col("doc_id"))
      val updated = Dedup.readPairGraph(spark, p)
      val oldLabels = Dedup.clusters(
        updated.join(bIds.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_anti")
          .join(bIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_anti"))
      val newPairs = updated.join(bIds.withColumnRenamed("doc_id", "id_a"),
          Seq("id_a"), "left_semi")
        .unionByName(updated.join(bIds.withColumnRenamed("doc_id", "id_b"),
          Seq("id_b"), "left_semi")).distinct()
      val folded = Dedup.updateClusters(oldLabels, newPairs)
      val full = Dedup.clusters(updated)
      artifactOk && folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty
    }

    // 3c. graph analytics over the same persisted pair set: label
    // propagation splits weakly-bridged clusters where CC over-merges
    // (its partition always REFINES the components — labels travel
    // only along edges), and link prediction surfaces 2-hop candidates
    // the pairwise gate never compared. The skew advisor closes the
    // loop: before any of these self-joins runs at 100 TB, the report
    // says which keys need salt — computed without joining fact rows.
    check("graph analytics: communities refine components; link prediction stays 2-hop; skew advisor exact") {
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      val both = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = exactKept.select(col("doc_id").as("id"))
      // converged variant, not a guessed iters (r13 verdict task 3):
      // the tour models the consumer path, and a deep component under
      // fixed iters=3 would silently under-propagate — run to the
      // detected stable labeling and surface a cap-hit loudly.
      // Self-loops give every node an inertia vote: synchronous LPA
      // 2-cycles forever on bipartite-ish structure (this fixture
      // does), and the self-vote makes tie-breaking monotone toward
      // the component minimum, guaranteeing convergence in diameter
      // rounds (the labelPropagationConverged scaladoc's contract)
      val withLoops = both.union(
        nodes.select(col("id").as("src"), col("id").as("dst")))
      // gate on the stable flag, not rounds < cap: a run converging
      // exactly AT the cap is legitimate, and the count alone can't
      // distinguish it from an unconverged cap hit (r14 advice)
      val (comm, lpaRounds, lpaStable) =
        graft.ops.Graph.labelPropagationConverged(nodes, withLoops, maxIters = 16)
      require(lpaStable, s"LPA hit the round cap unconverged ($lpaRounds rounds)")
      val cc = Dedup.clusters(pairs)
      // same community ⇒ same connected component (refinement), and
      // majority vote never yields FEWER groups than reachability
      val joined = comm.join(cc, Seq("id"), "left")
        .select(col("community"), coalesce(col("cluster_id"), col("id")).as("comp"))
      val refines = joined.groupBy("community")
        .agg(countDistinct("comp").as("k")).agg(max("k")).head().getLong(0) <= 1L
      val nComm = comm.select("community").distinct().count()
      val nComp = cc.select("cluster_id").distinct().count() +
        (nodes.count() - cc.count()) // singletons are their own component
      val linked = graft.ops.Graph.commonNeighbors(edges)
      val inGraph = pairs.select(col("id_a").as("id"))
        .union(pairs.select(col("id_b").as("id"))).distinct()
      val twoHopOnly = linked.select(col("id_a").as("id"))
        .union(linked.select(col("id_b").as("id")))
        .join(inGraph, Seq("id"), "left_anti").count() == 0
      val report = graft.ops.Skew.joinSkewReport(raw, raw, "lang",
        targetRowsPerTask = 1000L, topN = 3).collect()
      val top = raw.groupBy("lang").count().orderBy(col("count").desc, col("lang"))
        .head()
      val advisorExact = report.nonEmpty &&
        report(0).getString(0) == top.getString(0) &&
        report(0).getLong(3) == top.getLong(1) * top.getLong(1) &&
        report(0).getLong(4) == (report(0).getLong(3) + 999L) / 1000L
      refines && nComm >= nComp && twoHopOnly && advisorExact
    }

    // 3d. the pipeline's OBSERVABILITY surface: every drop attributable
    // (first failing rule), the whole chain's survival as one funnel
    // row per source, and the skew advisor's output consumed directly
    // as a per-key salting plan
    check("filter audit attributes every drop; funnel is monotone; advisor-driven salting is lossless") {
      val reasons = TextOps.filterReasons(raw).cache()
      val attributable = reasons.filter(col("keep") === 0 &&
        col("reason") === "keep").count() == 0 &&
        reasons.filter(col("keep") === 1 && col("reason") =!= "keep").count() == 0
      val funnel = graft.queries.Pipeline.t43CurationFunnel(spark, sf).collect()
      val monotone = funnel.forall(r => r.getLong(1) >= r.getLong(2) &&
        r.getLong(2) >= r.getLong(3) && r.getLong(3) >= r.getLong(4))
      val report = graft.ops.Skew.joinSkewReport(raw, raw, "lang",
        targetRowsPerTask = 500L)
      val adaptive = graft.ops.Skew.adaptiveSaltedJoin(
        raw.select(col("doc_id"), col("lang")),
        raw.select(col("lang"), col("source")).distinct(), "lang", report)
      val direct = raw.select(col("doc_id"), col("lang"))
        .join(raw.select(col("lang"), col("source")).distinct(), "lang")
      val lossless = adaptive.count() == direct.count() &&
        adaptive.exceptAll(direct).isEmpty
      attributable && monotone && lossless
    }

    // 4. decontaminate against a held-out eval slice
    val evalSet = deduped.filter(col("doc_id") % 17 === 0)
    val train0 = deduped.filter(col("doc_id") % 17 =!= 0)
    check("decontamination scan flags eval overlap without dropping train rows") {
      val cont = Dedup.ngramContamination(evalSet, train0, n = 3)
      cont.count() == evalSet.count() &&
        cont.agg(max("contamination")).head().getDouble(0) <= 1.0
    }

    // 4b. targeted retrieval — the decontamination REVIEW tool: rank
    // the train docs most relevant to an eval-style query with the
    // integer BM25 ranker (rare terms dominate via idf; deterministic
    // ties), so a human or judge model reads 10 docs, not the corpus
    check("BM25 retrieval surfaces a ranked, deterministic review set") {
      val hits = TextOps.bm25TopK(train0, Seq("dup", "spark", "vector"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val again = TextOps.bm25TopK(train0, Seq("dup", "spark", "vector"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      hits.length == 10 && hits.sameElements(again) &&
        hits.map(_._2).sameElements(hits.map(_._2).sortBy(-_))
    }

    // 5. split deterministically; the train set is the deliverable
    val split = graft.ops.Sampling.hashSplit(train0, Seq("doc_id"),
      Seq(("train", 0.9), ("val", 0.1)))
    val train = split.filter(col("split") === "train")
    check("split is total and reproducible down to the exact id set") {
      val ids = train.select("doc_id")
      val again = graft.ops.Sampling.hashSplit(train0, Seq("doc_id"),
          Seq(("train", 0.9), ("val", 0.1)))
        .filter(col("split") === "train")
        .select("doc_id")
      split.count() == train0.count() && ids.count() > 0 &&
        ids.exceptAll(again).isEmpty && again.exceptAll(ids).isEmpty
    }

    // 5a. corpus-typicality report: the bigram LM score every CCNet-ish
    // pipeline thresholds on — here a report stage (the fixture is
    // uniform word salad, so a fixed cut would be arbitrary), checked
    // for totality + determinism; production sets a percentile floor
    check("bigram LM scores cover every train doc deterministically") {
      val s1 = TextOps.bigramLmScore(train).select("doc_id", "lm_micro")
      val s2 = TextOps.bigramLmScore(train).select("doc_id", "lm_micro")
      s1.count() == train.count() &&
        s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty &&
        s1.filter(col("lm_micro") < 0).count() == 0
    }

    // 5a2. mixture: apportion a fixed-size sample across sources by
    // integer largest-remainder quotas — the "data mixing" step that
    // turns ratio targets into exact doc counts
    check("domain mixture draws the apportioned total with per-source quotas") {
      val withSource = train.join(raw.select("doc_id", "source"), "doc_id")
      val mix = graft.ops.Sampling.domainMixture(
        withSource.select(col("doc_id"), col("source")), "source",
        lit(1L), total = 40L)
      // replicate the uniform-weight apportionment on the driver: base
      // per present source, +1 to the first `leftover` by name (the
      // rem-tie order), capped at availability
      val counts = withSource.groupBy("source").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      val w = counts.length.toLong
      val base = 40L / w
      val leftover = 40L - base * w
      val expected = counts.zipWithIndex.map { case ((_, n), i) =>
        math.min(base + (if (i < leftover) 1L else 0L), n)
      }.sum
      mix.count() == expected &&
        mix.groupBy("source").count()
          .agg(max("count")).head().getLong(0) <= base + 1
    }

    // 5a3. temperature mixture: the α = 0.5 rebalancing — quotas ∝ √n
    // flatten the head source and lift the tail, and because sqrt is
    // IEEE-exact the quotas are reproducible anywhere
    check("temperature mixture flattens the head source vs its corpus share") {
      val withSource = train.join(raw.select("doc_id", "source"), "doc_id").cache()
      val mix = graft.ops.Sampling.temperatureMixture(
        withSource.select(col("doc_id"), col("source")), "source", total = 40L)
      val corpus = withSource.groupBy("source").count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val head = corpus.maxBy(_._2)
      val total = mix.count()
      val headDrawn = mix.filter(col("source") === head._1).count()
      val n = corpus.map(_._2).sum
      // ±1 for largest-remainder rounding
      total > 0 && total <= 40L &&
        headDrawn <= (head._2.toDouble / n * total).ceil.toLong + 1
    }

    // 5c. leakage-safe split: re-key the hash split on the near-dup
    // COMPONENT so no near-duplicate pair straddles train/val — the
    // contamination hole a per-doc split leaves open
    check("leakage-safe split keeps every near-dup component on one side") {
      val safe = graft.ops.Sampling.leakageSafeSplit(
        raw.select("doc_id"), pairs, "doc_id",
        Seq(("train", 0.9), ("val", 0.1)))
      safe.count() == n0 &&
        safe.groupBy("group_id")
          .agg(countDistinct(col("split")).as("nsplits"))
          .filter(col("nsplits") > 1).count() == 0 &&
        safe.join(pairs, col("doc_id") === col("id_a"))
          .select(col("split").as("sa"), col("id_b"))
          .join(safe.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
          .filter(col("sa") =!= col("sb")).count() == 0
    }

    // 5b. pack the train set into ~equal-token shards for the trainer
    check("shard packing covers every train doc with contiguous token-budget shards") {
      val shards = graft.ops.PrefixSum.tokenBudgetShards(
          train.select("doc_id", "text"), budget = 2048L)
      // totality + contiguity as aggregates: shard ids span
      // [min, max] with no gaps exactly when the distinct count
      // equals the span width
      val agg = shards.agg(count(lit(1)).as("n"),
        countDistinct(col("shard")).as("nd"),
        (max(col("shard")) - min(col("shard")) + 1).as("span")).head()
      agg.getLong(0) == train.count() && agg.getLong(1) == agg.getLong(2)
    }

    // 5b2. the OTHER packing: GPT-style concat-and-chunk manifest —
    // fixed-length sequences, docs split across them; the manifest
    // must tile the global token stream exactly
    check("sequence-pack manifest tiles the global token stream with no gaps") {
      val packed = graft.ops.PrefixSum.seqPack(
        train.select("doc_id", "text"), seqLen = 2048L)
      val agg = packed.agg(count(lit(1)).as("n"), sum("n_tokens").as("tot"),
        max(col("offset") + col("n_tokens")).as("end")).head()
      agg.getLong(0) == train.count() && agg.getLong(1) == agg.getLong(2) &&
        packed.filter(col("first_seq") > col("last_seq")).count() == 0
    }

    // 5d. tokenizer round trip on the deliverable: train merges, encode
    // the corpus with them (counts shrink, never grow), and read the
    // vocab-coverage curve that sizes the final vocabulary
    check("BPE train+encode shrinks symbol counts; coverage is total at cutoff 1") {
      val k0 = TextOps.bpeEncode(train, Seq.empty[TextOps.BpeMerge])
        .withColumnRenamed("n_subwords", "n0")
      val enc = TextOps.bpeTrainEncode(train, k = 4)
      val joined = enc.join(k0.select("doc_id", "n0"), "doc_id").cache()
      val cov = TextOps.vocabCoverage(train, Seq(1L, 5L))
        .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
      joined.filter(col("n_subwords") > col("n0")).count() == 0 &&
        joined.filter(col("n_subwords") < col("n0")).count() > 0 &&
        cov(1L) == 1000000L && cov.getOrElse(5L, 0L) <= 1000000L
    }

    // 5c. corpus vocabulary profile under bounded memory — the
    // top-token report that seeds the next round's stopword /
    // boilerplate lists; capacity saturates the fixture vocab, so the
    // sketch must equal the exact counts
    check("heavy-hitter vocabulary profile matches exact counts at saturating capacity") {
      val toks = train.select(explode(TextOps.tokens(lower(col("text")))).as("token"))
        .filter(col("token") =!= "")
      val sketch = graft.ops.Approx.spaceSavingTopK(toks, "token", k = 5, capacity = 1024)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(5).collect().map(r => (r.getString(0), r.getLong(1)))
      sketch.sameElements(exact)
    }

    // 6. persist the corpus index the NEXT ingest batch will probe
    check("next-batch index: persisted signatures probe-equal to recompute") {
      val dir = java.nio.file.Files.createTempDirectory("curation_idx")
        .toFile.getAbsolutePath
      Dedup.writeMinhashIndex(train, s"$dir/idx", n = 3, k = 32, bands = 16)
      val idx = Dedup.readMinhashIndex(spark, s"$dir/idx")
      val probe = raw.filter(col("doc_id") % 97 === 0)
      val viaIdx = Dedup.minhashDedupNewPairs(probe, train, n = 3, k = 32,
          bands = 16, minJaccard = 0.5, corpusIndex = Some(idx))
        .select("id_a", "id_b")
      val direct = Dedup.minhashDedupNewPairs(probe, train, n = 3, k = 32,
          bands = 16, minJaccard = 0.5)
        .select("id_a", "id_b")
      viaIdx.exceptAll(direct).isEmpty && direct.exceptAll(viaIdx).isEmpty
    }

    check("drift watch: build-time moments flag a shifted ingest batch, not a faithful one") {
      // the monitoring tail of the curation loop: the ANN index rebuilt
      // on the curated corpus records its distribution fingerprint, and
      // the NEXT ingest batch is compared against it before it is
      // trusted — rebuild-on-drift instead of rebuild-on-schedule
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val idxDir = java.nio.file.Files.createTempDirectory("curation_drift")
        .toFile.getAbsolutePath
      graft.ext.IndexLifecycle.rebuildLshIndex(emb, s"$idxDir/ann", 64, 6, 8, 777L)
      val faithful = graft.ext.Similarity.maxAbsDrift(
        graft.ext.IndexLifecycle.driftSinceBuild(spark, s"$idxDir/ann", emb))
      val shifted = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.3f)).otherwise(x)).as("embedding"))
      val drifted = graft.ext.Similarity.maxAbsDrift(
        graft.ext.IndexLifecycle.driftSinceBuild(spark, s"$idxDir/ann", shifted))
      faithful == 0.0 && drifted > 0.25
    }

    check("hard-negative triplets: every anchor's negative is outside the near-dup margin") {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val triplets = graft.ext.Similarity.tripletMine(
        emb.filter(col("vec_id") < 12), emb, poolSize = 20, marginMicro = 50000L)
      triplets.count() > 0 &&
        triplets.filter(col("neg_micro") > col("pos_micro") - 50000L).count() == 0 &&
        triplets.filter(col("neg_id") === col("pos_id")).count() == 0
    }

    check("metadata reconciliation: every corrupted catalog string resolves by edit distance") {
      // source-metadata cleanup: scraped/typo'd catalog strings matched
      // back to the canonical catalog via the Ed-Join filtered
      // levenshtein join — every single-deletion corruption must
      // resolve to SOME catalog entry at distance <= 1
      val cat = Tables.part(spark, sf).select(col("p_partkey").as("id"),
        concat(col("p_name"), lit("-"), col("p_brand"), lit("-"),
          col("p_size").cast("string")).as("s"))
      val pos = (conv(substring(md5(col("s")), 1, 4), 16, 10).cast("long")
        % length(col("s"))).cast("int")
      val dirty = cat.filter(col("id") % 3 === 0).select(col("id"),
        concat(col("s").substr(lit(1), pos),
          col("s").substr(pos + lit(2), length(col("s")))).as("s"))
      val nDirty = dirty.count()
      val matched = graft.ext.Fuzzy.entityMatch(dirty, cat, maxDist = 2).cache()
      val ok = matched.count() == nDirty &&
        matched.filter(col("dist") > 1).count() == 0
      matched.unpersist()
      nDirty > 0 && ok
    }

    check("KMV sketches estimate curation survival without joining the corpora") {
      // "how much of the raw crawl survived curation" answered from two
      // k-row sketches: train ⊂ raw, so true jaccard = |train|/|raw| —
      // the estimate must land in its 1/sqrt(k) band
      val k = 128
      val skRaw = graft.ops.Approx.kmvSketch(raw, col("text"), k)
      val skTrain = graft.ops.Approx.kmvSketch(train, col("text"), k)
      val r = graft.ops.Approx.kmvOverlap(skRaw, skTrain, k).head()
      val trueJ = train.select(col("text")).distinct().count().toDouble /
        raw.select(col("text")).distinct().count()
      math.abs(r.getLong(3) / 1e6 - trueJ) <= 3.0 / math.sqrt(k)
    }

    check("chunk store screens a re-crawl batch as already-seen content at shifted offsets") {
      // ingest screening at sub-document granularity: a re-crawl of
      // existing pages arrives with banners prepended (every byte
      // offset shifted) under fresh ids — the persisted chunk store
      // must still recognize most of the content as seen, while a
      // genuinely novel batch must not match
      val root = java.nio.file.Files.createTempDirectory("graft_tour_chunks")
        .toFile.getAbsolutePath
      graft.ext.Dedup.writeChunkIndex(raw, s"$root/ci")
      val recrawl = raw.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"),
          concat(lit("BANNER COOKIE NOTICE >> "), col("text")).as("text"))
      val seen = graft.ext.Dedup.chunkProvenanceIndexed(spark, s"$root/ci", recrawl)
        .agg(sum("n_chunks").cast("long"), sum("n_seen").cast("long")).head()
      val novel = raw.filter(col("doc_id") % 7 === 1).limit(20)
        .select((col("doc_id") + 9500000L).as("doc_id"),
          reverse(col("text")).as("text"))
      val novelSeen = graft.ext.Dedup.chunkProvenanceIndexed(spark, s"$root/ci", novel)
        .agg(sum("n_chunks").cast("long"),
          coalesce(sum("n_seen"), lit(0L)).cast("long")).head()
      seen.getLong(1) * 2 > seen.getLong(0) &&
        novelSeen.getLong(1) * 2 < novelSeen.getLong(0)
    }

    check("trained lexical-diversity probe: mistakes collapse after iteration 1, predictions track labels") {
      // model-based curation trained IN the engine: a batch perceptron
      // learns the diversity rule from integer text features (centered
      // with corpus-typical offsets — the operator's doc note), then
      // classifies every doc in one literal-weights codegen pass
      val cls = graft.ext.Classify
      val feats = cls.textFeatures(raw)
        .withColumn("y", when(col("f3") * 2 >= col("f1"), 1L).otherwise(-1L))
        .select(col("doc_id"), col("f0"),
          (col("f1") - 56L).as("f1"), (col("f2") - 5L).as("f2"),
          (col("f3") - 23L).as("f3"), (col("f4") - 2L).as("f4"), col("y"))
      val cols = cls.textFeatureCols
      val traj = cls.perceptronTrain(feats, cols, "y", iters = 6)
        .orderBy("iter").collect()
      val w = cols.indices.map(j => traj.last.getLong(j + 2))
      val acc = cls.perceptronClassify(feats, cols, w)
        .join(feats.select(col("doc_id"), col("y")), "doc_id")
        .filter(col("pred") === col("y")).count()
      traj.head.getLong(1) == n0 && traj.last.getLong(1) * 10 < n0 &&
        acc * 10 > n0 * 9
    }

    println(if (failed == 0) "CurationTour: all checks passed"
            else s"CurationTour: $failed check(s) FAILED")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}

