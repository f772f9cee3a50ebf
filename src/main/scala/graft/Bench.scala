package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully executed via the `noop` sink (a bare `.count()`
  * would let Catalyst prune sorts/columns and under-measure).
  *
  * Robustness: after an UNMEASURED full-suite warmup pass at the bench
  * SF itself (codegen/JIT of every plan shape at its real AQE-chosen
  * physical form, parquet footers + page cache hot), each query is
  * measured `SPARK_GRAFT_BENCH_PASSES` times (default 3) and the
  * reported number is the MEDIAN; min/max across passes is emitted as
  * `spread` so a noisy run is visible in the artifact itself.
  *
  * A `scale_probe` section (factor `SPARK_GRAFT_BENCH_SCALE`, default
  * 10, 0 disables) re-times the serving-shaped operators — fixed probe
  * set against an id-salted ×N corpus — and reports per-row cost
  * ratios: a ratio ≫ 1 means some hidden super-linear or driver-side
  * cost appeared under growth that a single-SF artifact can't see.
  */
object Bench {

  /** Median of the measured passes: middle element for odd n, lower
    * middle for even n (conservative — never averages two passes into a
    * time no pass actually achieved).
    */
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  private def runToNoop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** k id-salted copies of a table — the ×k corpus for the scale probe.
    * Identical payloads with disjoint ids: distribution-preserving for
    * the probed (linear/serving) operators.
    */
  private def scaledBy(df: DataFrame, idCol: String, k: Int): DataFrame =
    (0 until k).map(i => df.withColumn(idCol, col(idCol) + lit(i * 1000000000L)))
      .reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val scaleK = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "10").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    // ERROR, not WARN: the artifact's stdout tail otherwise fills with
    // benign-but-noisy executor warnings (e.g. WindowExec's
    // single-partition advisory fired by the DOMAIN-cardinality windows
    // of Sampling.domainMixture, which are bounded by design) and
    // crowds out the JSON summary line the driver captures
    spark.sparkContext.setLogLevel("ERROR")
    // ---- warmup (unmeasured): flagship + table scans + ONE full pass
    // of the suite at the bench SF — the measured passes then time
    // steady state, not first-compile/first-touch latency (a first
    // measured pass absorbing JIT used to put a 7 s max on a 0.6 s
    // query's spread)
    // dev switch: SPARK_GRAFT_BENCH_ONLY=probes skips the measured
    // query suite (and its warmup) and runs just the scale/pair probes
    // — iterating on a probe arm shouldn't cost a 5-minute full bench
    val probesOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY").contains("probes")
    val names =
      if (probesOnly) Seq.empty else SparkEntry.queries.toSeq.sortBy(_._1)
    try {
      runToNoop(SparkEntry.entry(spark))
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        runToNoop(Tables(spark, sfDir, t))
      }
    } catch { case _: Throwable => () }
    names.foreach { case (name, fn) =>
      try runToNoop(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
      // reclaim checkpoint/cache blocks the query left behind (the
      // iterative operators' returned frames hold ONE live checkpoint
      // each by contract — graft.ops.Blocks — and only the session
      // lifecycle can know when it's consumed). Without this sweep the
      // block manager accumulates dead blocks across 193 queries × N
      // passes and the GC pressure lands on LATE passes of multi-job
      // queries — the exact r14 noise signature (s02/t25/d37 late-pass
      // degradation while single-job queries sat tight).
      graft.ops.Blocks.sweep(spark)
    }
    // ---- measured: pass-by-pass over the WHOLE query list (pass 1 of
    // all queries, then pass 2, ...) rather than back-to-back per
    // query: a transient machine-load spike then lands on DIFFERENT
    // queries in different passes and the median discards it.
    //
    // Per-pass protocol (r13 verdict task 1):
    //  - every pass (main AND stabilization) opens with a fixed cheap
    //    SENTINEL query whose time is recorded per pass: a suite-wide
    //    machine stall is then attributable in the artifact itself
    //    (sentinel slow => the machine, not the plans);
    //  - a failed pass contributes NO timing sample (a near-zero or
    //    stall-length sample from a throw would contaminate the
    //    median), and a query that has failed once is skipped on the
    //    remaining extra passes;
    //  - the reported statistic is ROBUST: with >= 3 samples the
    //    single max pass is dropped before taking the median, so one
    //    GC/IO stall pass (r13 saw 42.7 s on a 3.7 s-median query)
    //    cannot shift the reported number; the raw per-pass vectors
    //    are emitted under `pass_times` for full auditability.
    val sentinelFn: () => Unit = () =>
      runToNoop(Tables.lineitem(spark, sfDir)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")))
    val sentinelTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val failedSet = scala.collection.mutable.Set.empty[String]
    if (names.nonEmpty) sentinelFn() // unmeasured sentinel warmup
    for (_ <- 1 to passes) {
      if (names.nonEmpty) sentinelTimes += timeSec(sentinelFn())
      for ((name, fn) <- names) {
        val t0 = System.nanoTime()
        try {
          runToNoop(fn(spark, sfDir))
          timings(name) = timings(name) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failedSet += name
        }
        // outside the timing window: drop the blocks this query leaked
        // so they can't tax any LATER query's measurement
        graft.ops.Blocks.sweep(spark)
      }
      // settle GC debt at the pass seam, not inside anyone's window
      System.gc()
    }
    // robust per-query statistic: drop the single max sample when we
    // have >= 3, then median; spread is over the POST-DROP set (the
    // set the statistic is computed from)
    def robustSamples(ts: Vector[Double]): Vector[Double] =
      if (ts.size >= 3) ts.patch(ts.indexOf(ts.max), Nil, 1) else ts
    def spreadRatio(ts: Vector[Double]): Double = {
      val r = robustSamples(ts)
      val med = if (r.isEmpty) 0.0 else median(r)
      if (r.isEmpty || med <= 0) 0.0 else (r.max - r.min) / med
    }
    // ---- tail stabilization (r12 verdict task 4, protocol fixed per
    // r13 verdict task 1): a query whose POST-DROP pass spread exceeds
    // half its median gets extra measured passes, run pass-by-pass
    // over the noisy subset with a sentinel opening each extra pass —
    // the artifact can then tell "this query is noisy" from "the
    // machine stalled during the extra passes".
    val extraPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA", "4").toInt
    val stabilized =
      if (extraPasses <= 0 || probesOnly) Seq.empty[String]
      else {
        // only the expensive tail stabilizes: a sub-second query's
        // relative spread is JIT/page-cache noise whose ABSOLUTE
        // contribution to the total is bounded by its own size —
        // extra passes there buy nothing (r14: q29 at 0.48 s median
        // spread 0.45-1.33 across 7 passes, pure cache states), while
        // the r12 motivation was 2.5-6 s queries swinging seconds
        val noisy = names.filter { case (name, _) =>
          !failedSet(name) && spreadRatio(timings(name)) > 0.5 && {
            val r = robustSamples(timings(name))
            r.nonEmpty && median(r) >= 1.0
          }
        }
        if (noisy.nonEmpty) System.err.println(
          s"[bench] stabilizing ${noisy.size} noisy queries (+$extraPasses " +
            s"passes): ${noisy.map(_._1).mkString(",")}")
        for (_ <- 1 to extraPasses if noisy.nonEmpty) {
          sentinelTimes += timeSec(sentinelFn())
          for ((name, fn) <- noisy if !failedSet(name)) {
            val t0 = System.nanoTime()
            try {
              runToNoop(fn(spark, sfDir))
              timings(name) = timings(name) :+ (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              failedSet += name
            }
            graft.ops.Blocks.sweep(spark) // same seam hygiene as the main loop
          }
          System.gc()
        }
        noisy.map(_._1)
      }
    val results = names.map { case (name, _) =>
      val r = robustSamples(timings(name))
      if (r.isEmpty) (name, 0.0, 0.0, 0.0)
      else (name, median(r), r.min, r.max)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, mn, mx) => "\"" + k + "\":[" + f"$mn%.3f" + "," + f"$mx%.3f" + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val probeJson = if (scaleK > 1) scaleProbe(spark, sfDir, scaleK) else "{}"
    val pairJson = if (scaleK > 1) pairProbe(spark, sfDir, scaleK) else "{}"
    // second decade for the indexed serving family only (cheap arms)
    val scaleK100 = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE100", "100").toInt
    val probe100Json =
      if (scaleK > 1 && scaleK100 > 1) serveProbe100(spark, sfDir, scaleK100)
      else "{}"
    // ×100 domain-space growth for the iterative graph family (r16
    // verdict task 8) — artifact-only, like every probe block
    val graphProbeJson =
      if (scaleK > 1 && scaleK100 > 1) graphProbe100(spark, scaleK100)
      else "{}"
    // continuous gate on the 100× profile path: max per-column relative
    // distinct-count error of the HLL profile (q28a) vs the exact
    // profile (q28) at THIS bench SF — the ≤ 2 % bound the fixture spec
    // pins is re-measured at every scale the bench ever runs at, and a
    // breach lands in `failed`, not just a number nobody reads
    val hllErr = try {
      val orders = Tables.orders(spark, sfDir)
      val exact = graft.ops.Profiler.profile(orders)
        .select(col("column"), col("n_distinct").as("nd_exact"))
      val approx = graft.ops.Profiler.profileApprox(orders)
        .select(col("column"), col("n_distinct").as("nd_approx"))
      val err = exact.join(approx, "column")
        .agg(max(abs(col("nd_approx") - col("nd_exact")).cast("double") /
          greatest(col("nd_exact").cast("double"), lit(1.0))))
        .head().getDouble(0)
      if (err > 0.02) {
        System.err.println(f"[bench] hll_profile error $err%.4f exceeds the 0.02 bound")
        failedSet += "hll_profile"
      }
      err
    } catch { case e: Throwable =>
      System.err.println(s"[bench] hll_profile check failed: ${e.getMessage}")
      failedSet += "hll_profile"; -1.0
    }
    // failed queries must be visible IN the JSON line — a near-zero
    // timing for a query that threw would read as a performance win
    val failed = failedSet.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the FULL artifact goes to a file: the per-query medians + spread
    // for 61 queries overflow what a line-driven capture keeps (r6/r7
    // artifacts ended up with "parsed: null" and a truncated tail), so
    // stdout carries only a short parseable summary pointing at it
    // probes-only dev runs write aside by default: a probe iteration
    // must never clobber the committed full-suite artifact
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (probesOnly) "bench_probes.json" else "bench_out.json")
    val stabJson = stabilized.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-pass raw samples (including any dropped max) — the audit
    // trail behind the robust medians
    val passTimes = names.map { case (name, _) =>
      "\"" + name + "\":[" +
        timings(name).map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val sentinelJson =
      sentinelTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
    // pinned environment (r13 verdict task 7): the forked JVM's flags
    // and heap, so an artifact-to-artifact comparison can first check
    // the environments match
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val jvmFlags = rt.getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("-X") || a.startsWith("-XX"))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val maxHeapMb = Runtime.getRuntime.maxMemory / (1024L * 1024L)
    val jvmJson = s"""{"flags":$jvmFlags,"max_heap_mb":$maxHeapMb,"version":"${System.getProperty("java.version")}"}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"passes":$passes,"stabilized":$stabJson,"failed":$failed,"pass_times":$passTimes,"sentinel":$sentinelJson,"jvm":$jvmJson,"scale_probe":$probeJson,"scale_probe_100":$probe100Json,"graph_probe_100":$graphProbeJson,"pair_probe":$pairJson,"hll_profile_max_err":$hllErr%.4f,"sf":"$sfDir"}"""
    // the previous full-suite artifact becomes bench_prev.json so the
    // run itself can regenerate docs/PERF_DELTA.md (r13 verdict task 2
    // — the movement table lands in the SAME round as the bench)
    // prev artifact lives NEXT TO the out artifact (overridable), so a
    // run writing elsewhere doesn't clobber ./bench_prev.json and two
    // concurrent runs in one checkout don't race on a shared path
    // (r14 advice — same class as the r12 temp-dir index fix)
    val outP = java.nio.file.Paths.get(outPath)
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", {
      val parent = Option(outP.toAbsolutePath.getParent)
      parent.map(_.resolve("bench_prev.json").toString).getOrElse("bench_prev.json")
    })
    if (!probesOnly && java.nio.file.Files.exists(outP))
      java.nio.file.Files.copy(outP, java.nio.file.Paths.get(prevPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.write(outP,
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (!probesOnly) {
      try PerfDelta.write(prevPath, outPath, "docs/PERF_DELTA.md")
      catch { case e: Throwable =>
        System.err.println(s"[bench] perf delta generation failed: ${e.getMessage}")
      }
    }
    // the stdout line carries the per-query medians too (r16 verdict
    // task 1: the driver's round-over-round PERF comparison reads ONLY
    // this line, and with total-only it had n_common=0 — blind to every
    // per-query movement). pass_times/spread/probes stay artifact-only:
    // the medians map for 231 queries is ~7 KB, the raw vectors are what
    // overflowed line-driven captures in r6/r7.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"passes":$passes,"failed":$failed,"sf":"$sfDir","full_artifact":"$outPath"}""")
    spark.stop()
  }

  /** Times each probed operator at ×1 and ×k corpus size and reports
    * `per_row_ratio` = t(×k) / (k · t(×1)) — ~1/k-to-1 for a healthy
    * linear operator (fixed job overhead dominates the small ×1 run),
    * ≫ 1 when growth uncovered super-linear work. Probes are the
    * serving/linear family on purpose: pair-GENERATING operators have
    * data-dependent output structure (a ×k id-salted corpus multiplies
    * true near-dup groups), so their cost is gated by plan shape in
    * PlanSpec instead.
    */
  private def scaleProbe(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, k: Int): String = {
    import graft.ext.{Dedup, Similarity, TextOps}
    def docsAt(n: Int) = scaledBy(Tables.documents(spark, sfDir), "doc_id", n)
    def embAt(n: Int) = scaledBy(Tables.embeddings(spark, sfDir), "vec_id", n)
    // zipfian fact + non-broadcastable dim for the salted_join arms:
    // event_id % 10 survives scaledBy's 1e9 offsets, so user 0 stays
    // the hot key in every copy (count n·|events|/10 — 10 % of the
    // corpus on one key: plenty to serialize one SMJ task, cheap
    // enough that the pathological plain arm doesn't dominate probe
    // wall-time at ×10)
    def skewedFact(n: Int) = scaledBy(Tables.events(spark, sfDir), "event_id", n)
      .withColumn("user_id",
        when(col("event_id") % 10 === 0, lit(0L)).otherwise(col("user_id")))
    val userPadDim = Tables.events(spark, sfDir).select(col("user_id")).distinct()
      .withColumn("pad", lpad(lit("x"), 8192, "x")).persist()
    userPadDim.count()
    // fixed probe/eval sets: only copy-0 ids pass these filters
    def queries(n: Int) = embAt(n).filter(col("vec_id") < 20)
    def evalDocs(n: Int) = docsAt(n)
      .filter(col("doc_id") < 1000000000L && col("doc_id") % 17 === 0)
    // prebuilt IVF indexes for the ivf_serve_indexed arm — built and
    // cached OUTSIDE the timed fns: serving probes measure per-batch
    // cost; the corpus assignment is amortized setup (the persisted-
    // index production path, Similarity.writeIvfIndex)
    val ivfIdx: Map[Int, (DataFrame, DataFrame)] = Seq(1, k).map { n =>
      val (cb, lists) = Similarity.ivfIndex(embAt(n), 16)
      val cbC = cb.persist(); val listsC = lists.persist()
      cbC.count(); listsC.count()
      n -> ((cbC: DataFrame, listsC: DataFrame))
    }.toMap
    // prebuilt minhash band indexes for the incr_pairs_idx arm — built
    // and cached OUTSIDE the timed fn, mirroring ivf_serve_indexed: the
    // index lifecycle's claim is that an ingest batch never re-signatures
    // the corpus, so the timed cost is batch signatures + bucket probe +
    // candidate verify only (the minhashDedupNewPairsAt production path)
    val mhIdx: Map[Int, DataFrame] = Seq(1, k).map { n =>
      val idx = Dedup.minhashIndex(docsAt(n), n = 3, k = 32, bands = 16).persist()
      idx.count()
      n -> idx
    }.toMap
    // prebuilt LSH bucket indexes for the hybrid_serve arm — the
    // semantic arm probes a PREBUILT index (the startAtHybrid serving
    // path); the static lexical arm and the RRF fusion are list-sized
    val lshParams = graft.ext.Similarity.LshParams(64, 12, 4, 1000L)
    val lshIdx: Map[Int, DataFrame] = Seq(1, k).map { n =>
      val idx = Similarity.lshIndex(embAt(n), lshParams.dim,
        lshParams.bitsPerTable, lshParams.tables, lshParams.seedBase).persist()
      idx.count()
      n -> idx
    }.toMap
    val lexArmFixed = spark.range(20).selectExpr("id AS query_id")
      .crossJoin(spark.range(1, 11).selectExpr("id AS rank"))
      .selectExpr("query_id", "query_id * 3 + rank * 7 AS doc_id", "rank")
      .persist()
    lexArmFixed.count()
    // the d27 record-linkage fixture at bench scale: catalog = the
    // part string (scaled by id-salting — copies share strings, so
    // matches multiply linearly), dirty = a FIXED small batch of
    // md5-position-corrupted copy-0 strings
    def partsAt(n: Int) = scaledBy(Tables.part(spark, sfDir), "p_partkey", n)
      .select(col("p_partkey").as("id"),
        concat(col("p_name"), lit("-"), col("p_brand"), lit("-"),
          col("p_size").cast("string")).as("s"))
    val dirtyParts = {
      val base = partsAt(1).filter(col("id") < 1000000000L && col("id") % 30 === 0)
      val pos = (conv(substring(md5(col("s")), 1, 4), 16, 10).cast("long")
        % length(col("s"))).cast("int")
      val d = base.select(col("id"),
        concat(col("s").substr(lit(1), pos),
          col("s").substr(pos + lit(2), length(col("s")))).as("s")).persist()
      d.count()
      d
    }
    // prebuilt IVF-PQ composite artifacts for the ivfpq_serve_indexed
    // arm — the writeIvfPqIndex production path, built outside the
    // timed fn like every serve index here
    val ivfPqIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_ivfpq")
        .toFile.getAbsolutePath + "/ivfpq"
      Similarity.writeIvfPqIndex(embAt(n), p, nLists = 16, m = 4, k = 8, iters = 2)
      n -> p
    }.toMap
    // prebuilt catalog indexes for the fuzzy_serve_indexed arm — built
    // outside the timed fn (the writeCatalogIndex production path)
    val fuzzyIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_fuzzy")
        .toFile.getAbsolutePath + "/catalog"
      graft.ext.Fuzzy.writeCatalogIndex(partsAt(n), p, maxDist = 2)
      n -> p
    }.toMap
    // prebuilt inverted indexes for the bm25_indexed arm — built
    // outside the timed fn (the writeTextIndex production path): the
    // lifecycle's claim is that a query never re-tokenizes the corpus,
    // so the timed cost is the pruned term-slice read + k-row top-k
    val textIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_text")
        .toFile.getAbsolutePath + "/ti"
      TextOps.writeTextIndex(docsAt(n), p)
      n -> p
    }.toMap
    // prebuilt tf-idf indexes for the tfidf_serve_indexed arm — built
    // outside the timed fn (the writeTfidfIndex production path): the
    // t62b lifecycle's claim is that a query reads only its terms'
    // postings slice (norms ride the rows), never the corpus
    val tfidfIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_tfidf")
        .toFile.getAbsolutePath + "/tfi"
      TextOps.writeTfidfIndex(docsAt(n), p)
      n -> p
    }.toMap
    // prebuilt rank artifacts for the rank_warm_update arm — built
    // outside the timed fn (the writeRankIndex production path): the
    // g13 lifecycle's claim is a recrawl warm-starts from the
    // persisted vector instead of re-converging from uniform, so the
    // timed cost is current-snapshot harvest/rollup + the warm rounds
    val rankIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_rank")
        .toFile.getAbsolutePath + "/ri"
      val pairs = graft.queries.Pipeline.syntheticPageLinkDomains(docsAt(n))
      val edges = pairs
        .groupBy(col("page_domain").as("src"), col("domain").as("dst"))
        .agg(count(lit(1)).cast("long").as("w"))
      val nodes = pairs.select(col("page_domain").as("id"))
        .unionByName(pairs.select(col("domain").as("id"))).distinct()
      graft.ops.RankIndex.writeRankIndex(nodes, edges, p, iters = 3)
      n -> p
    }.toMap
    // prebuilt chunk stores for the cdc_serve_indexed arm — built
    // outside the timed fn (the writeChunkIndex production path): the
    // lifecycle's claim is that an ingest batch never re-chunks the
    // corpus, so the timed cost is chunk(batch) + one streamed
    // artifact scan under a broadcast semi probe
    val chunkIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_chunks")
        .toFile.getAbsolutePath + "/ci"
      Dedup.writeChunkIndex(docsAt(n), p)
      n -> p
    }.toMap
    val chunkBatch = {
      val b = docsAt(1)
        .filter(col("doc_id") < 1000000000L && col("doc_id") % 17 === 0)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(lit("EDIT >> "), col("text")).as("text")).persist()
      b.count()
      b
    }
    // fixed merge table for the bpe_encode arm — training is amortized
    // setup (the t25 production path); the arm times ENCODE only
    val bpeMergesFixed: Seq[TextOps.BpeMerge] =
      TextOps.bpeMerges(Tables.documents(spark, sfDir), k = 8).collect()
        .map(r => TextOps.BpeMerge(r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val probes: Seq[(String, Int => DataFrame)] = Seq(
      "exact_dedup" -> (n => Dedup.exactDedup(docsAt(n))),
      "simhash_fp" -> (n => Dedup.simhash64(docsAt(n))),
      "vocab" -> (n => docsAt(n)
        .select(explode(TextOps.tokens(lower(col("text")))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("tf"))),
      "quality" -> (n => docsAt(n).select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("q"))),
      "repetition" -> (n => TextOps.repetitionRatio(docsAt(n))),
      "contam_bloom" -> (n => Dedup.ngramContaminationApprox(
        evalDocs(n), docsAt(n), n = 3, fpp = 0.01)),
      // d40's bit-exact variant: Bloom prefilter + exact verify — the
      // exchange carries only Bloom-admitted candidates, so growth
      // must track the approx arm's (the extra semi-join is keyed at
      // candidate cardinality, not eval-shingle cardinality)
      "contam_bloom_exact" -> (n => Dedup.ngramContaminationBloomExact(
        evalDocs(n), docsAt(n), n = 3, fpp = 0.01)),
      "lsh_serve" -> (n => Similarity.lshTopK(queries(n), embAt(n), k = 5,
        dim = 64, bitsPerTable = 12, tables = 4)),
      // full rebuild per call: TWO whole-corpus passes (codebook
      // TakeOrdered + list assignment) dominate its ×1 run, so the
      // per-row ratio floors near (10c+o)/(10(c+o)) ≈ 0.6 without any
      // super-linear work — the marginal slope is flat (measured 0.27
      // s/unit ×1→×10 vs 0.25 ×10→×20; see Similarity.ivfTopK). The
      // indexed arm below isolates true serving cost.
      "ivf_serve" -> (n => Similarity.ivfTopK(queries(n), embAt(n), k = 5,
        nCentroids = 16, nProbe = 4)),
      // the production path: probe a PREBUILT index — per-batch work is
      // probe hashing + the nProbe/nCentroids candidate join + rank
      "ivf_serve_indexed" -> (n => Similarity.ivfTopK(queries(n), embAt(n), k = 5,
        nProbe = 4, corpusIndex = Some(ivfIdx(n)))),
      // the composite: probe a PREBUILT IVF-PQ artifact — timed work is
      // the probe LUT + the nProbe/nLists integer-code join + rank; the
      // corpus' floats are never read (PQ's ~68× shrink under IVF's
      // nProbe/nLists prune)
      "ivfpq_serve_indexed" -> (n => Similarity.ivfPqTopKAt(
        spark, queries(n), k = 5, ivfPqIdx(n), nProbe = 4)),
      // coarse-to-fine serving: 16-dim prefix pool + full-width rerank —
      // the corpus-sized stage touches d'/d of the bytes; growth should
      // stay scan-bound like the other serving arms
      "trunc_rerank" -> (n => Similarity.truncatedRerankTopK(queries(n), embAt(n),
        k = 5, dPrime = 16, candidates = 64)),
      // incremental exact pairing: fixed batch vs ×n corpus — the
      // batch's shingles broadcast, so growth is the corpus-side scan +
      // candidate verify, never corpus²
      "incr_pairs" -> (n => Dedup.ngramJaccardNewPairs(
        evalDocs(n), docsAt(n), n = 3, minJaccard = 0.5)),
      // the artifact-backed incremental path the lifecycle actually
      // runs: fixed batch probed against a PREBUILT minhash band index
      // — timed work is batch signatures + bucket probe + verify; the
      // corpus is never re-signatured (vs incr_pairs' from-scratch
      // re-shingle above)
      "incr_pairs_idx" -> (n => Dedup.minhashDedupNewPairs(
        evalDocs(n), docsAt(n), n = 3, k = 32, bands = 16, minJaccard = 0.5,
        corpusIndex = Some(mhIdx(n)))),
      // first-seen attribution: shingle-keyed min + join-back — the
      // contamination scan's shuffle profile, growth should be linear
      "novelty" -> (n => Dedup.noveltyScores(docsAt(n))),
      "token_shards" -> (n => graft.ops.PrefixSum.tokenBudgetShards(
        docsAt(n).select(col("doc_id"), col("text")), budget = 512L)),
      // iterative but per-iteration linear: assignment is a narrow
      // literal-codebook pass, the update one k·dim-key exchange
      "kmeans_train" -> (n => Similarity.trainCodebook(embAt(n), k = 8, iters = 2)),
      // scan-side isin prune: only query-term rows ever shuffle
      "bm25" -> (n => TextOps.bm25TopK(docsAt(n),
        Seq("dup", "spark", "vector", "merge"), k = 20)),
      // same retrieval served from the persisted inverted index: the
      // corpus contribution is a token-pruned postings read, never a
      // re-tokenize — must beat the from-scratch arm in absolute time
      "bm25_indexed" -> (n => TextOps.bm25ServeIndexed(spark, textIdx(n),
        Seq("dup", "spark", "vector", "merge"), k = 20)),
      // t62 served from the persisted tf-idf artifact: a token-pruned
      // postings read with the doc norm riding each row — no corpus
      // re-tokenize, no doc-cardinality norms join
      "tfidf_serve_indexed" -> (n => TextOps.tfidfCosineTopKAt(spark,
        tfidfIdx(n), Seq("dup", "spark", "vector", "merge"), k = 20)),
      // O(capacity) state per partition regardless of input size
      "heavy_hitters" -> (n => graft.ops.Approx.spaceSavingTopK(
        docsAt(n).select(explode(TextOps.tokens(lower(col("text")))).as("token"))
          .filter(col("token") =!= ""), "token", k = 15, capacity = 1024)),
      // per-iteration cost is ONE fused scan for all m subspaces
      "pq_train" -> (n => Similarity.pqTrain(embAt(n), m = 4, k = 8, iters = 2)),
      // one scan + single Expand regardless of width; distinct-value
      // sets are content-bound, so growth is scan-bound
      "column_profile" -> (n => graft.ops.Profiler.profile(
        scaledBy(Tables.orders(spark, sfDir), "o_orderkey", n))),
      // the 100× profile path: HLL sketches, ONE plain-agg scan, no
      // Expand — growth should be pure scan cost
      "column_profile_approx" -> (n => graft.ops.Profiler.profileApprox(
        scaledBy(Tables.orders(spark, sfDir), "o_orderkey", n))),
      // hybrid retrieval serving against a PREBUILT LSH index: probe
      // hashing + bucket join for the semantic arm, list-sized lexical
      // arm + RRF fusion — per-batch cost must stay bucket-bound as
      // the corpus grows (the startAtHybrid per-trigger shape)
      "hybrid_serve" -> { n =>
        val sem = Similarity.lshTopKIndexed(
            embAt(n).filter(col("vec_id") < 20), lshIdx(n), 50, lshParams)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Similarity.rrfFusePerQuery(Seq(sem, lexArmFixed), k = 10)
      },
      // distribution fingerprint for the drift monitor: one posexplode
      // + map-side-combined dim-cardinality agg — growth must be pure
      // scan cost (dim rows out regardless of corpus size)
      "emb_moments" -> (n => Similarity.embeddingMoments(embAt(n))),
      // broadcast-weights inference: a narrow codegen projection —
      // growth must be pure scan cost
      "linear_probe" -> (n => Similarity.linearProbe(embAt(n),
        weights = Seq.tabulate(64)(j => ((j * 37) % 21 - 10) / 10.0),
        bias = 0.05)),
      // tokenizer ENCODE with pretrained merges (trained once in
      // setup): a literal replace chain, scan-bound
      "bpe_encode" -> (n => TextOps.bpeEncode(docsAt(n), bpeMergesFixed)),
      // two-phase global prefix sum: one range + one hash exchange of
      // narrow rows — growth should be exchange-bound, never
      // single-task
      "seq_pack" -> (n => graft.ops.PrefixSum.seqPack(
        docsAt(n).select(col("doc_id"), col("text")), seqLen = 64L)),
      // KMV corpus sketch: distinct of an 8-byte hash then TakeOrdered
      // (per-partition k-row heaps, no corpus-sized sort) — growth
      // must be pure scan + partial-agg cost
      "kmv_sketch" -> (n => graft.ops.Approx.kmvSketch(
        docsAt(n), col("text"), 256)),
      // edit-distance matching, fixed dirty batch vs ×n catalog: the
      // Ed-Join rare-gram prefix arm must stay candidate-bound (true
      // matches grow linearly with the salted catalog) while the
      // band-join naive verifies the whole length cohort every time.
      // The band arm runs a BATCH/10 subsample (it costs ~60ms per
      // dirty row against the ×1 catalog — measured 38.5s for the full
      // 667-row batch); multiply its times by 10 to compare absolute
      // cost with fuzzy_edjoin's full batch (the ×1 crossover is ~11×)
      "fuzzy_band" -> (n => graft.ext.Fuzzy.fuzzyJoinBand(
        dirtyParts.filter(col("id") % 300 === 0), partsAt(n), maxDist = 2)),
      "fuzzy_edjoin" -> (n => graft.ext.Fuzzy.fuzzyJoin(
        dirtyParts, partsAt(n), maxDist = 2)),
      // the production serving path: probe a PREBUILT catalog index —
      // per-batch work is the batch's own prefixes (ranked under the
      // stored df) + the prefix-table join + candidate verify; the
      // catalog is never re-grammed
      "fuzzy_serve_indexed" -> (n => graft.ext.Fuzzy.fuzzyJoinIndexed(
        spark, dirtyParts, fuzzyIdx(n))),
      // JL sparse random projection: outDim fused codegen dots per row
      // — growth must be pure scan cost (a narrow pass, no shuffle)
      "random_projection" -> (n => Similarity.randomProjection(
        embAt(n), outDim = 16, seed = 7L)),
      // one-pass multi-pattern blocklist: the Aho-Corasick expression
      // scans each text once regardless of pattern count — growth must
      // be pure scan cost (hit-cardinality rows out)
      "ac_blocklist" -> (n => TextOps.blocklistHits(docsAt(n), Seq(
        "fast", "fast table", "table table", "a a", "value part",
        "slow filter", "big vector", "scan query", "key agg",
        "merge batch", "customer line", "the row"))),
      // Count-Min sketch build: one posexplode (×depth) + one
      // map-side-combined agg into ≤ depth·width cells — growth must
      // be scan + partial-agg cost, output stays sketch-sized
      "cms_sketch" -> (n => graft.ops.Approx.cmsSketch(
        docsAt(n).select(explode(
          split(trim(col("text")), "[ \\t\\n\\f\\r]+")).as("token")),
        "token", depth = 4, width = 512)),
      // histogram sketch build + quantile walk: one codegen bucket
      // expression + one map-side-combined agg into ≤ buckets cells;
      // the rank walk runs over sketch-sized rows — growth must be
      // pure scan cost
      "hist_sketch" -> (n => graft.ops.Approx.histQuantiles(
        graft.ops.Approx.histSketch(
          docsAt(n), col("n_chars"), lo = 0L, hi = 640L, buckets = 64),
        Seq(500000L, 990000L), lo = 0L, hi = 640L, buckets = 64)),
      // per-clip WAV decode + integer metrics: the codec boundary is
      // the cost; one decode per row, payloads never shuffle
      "audio_gate" -> (n => {
        implicit val s: org.apache.spark.sql.SparkSession = spark
        graft.ext.Multimodal.audioQualityRules(
          graft.ext.Multimodal.syntheticWavClasses(docsAt(n)))
      }),
      // per-image JPEG encode+decode+metrics: the lossy-codec boundary
      // is the cost (audio_gate's image twin, r13 task 4); one decode
      // per row, payloads never shuffle — growth must be codec-linear
      "jpeg_gate" -> (n => {
        implicit val s: org.apache.spark.sql.SparkSession = spark
        graft.ext.Multimodal.imageQualityRules(
          graft.ext.Multimodal.syntheticJpeg(docsAt(n)))
      }),
      // header-only container metadata over mixed PNG/JPEG payloads:
      // the timed cost is fixture encode + an O(header) marker/IHDR
      // walk — never inflate or IDCT; growth must be codec-linear
      // like jpeg_gate but with a smaller constant (no decode side)
      "container_meta" -> (n => {
        implicit val s: org.apache.spark.sql.SparkSession = spark
        graft.ext.Multimodal.containerMeta(
          graft.ext.Multimodal.syntheticPng(
              docsAt(n).filter(col("doc_id") % 2 === 0))
            .unionByName(graft.ext.Multimodal.syntheticJpeg(
              docsAt(n).filter(col("doc_id") % 2 =!= 0))))
      }),
      // audio peak normalization (m15): one decode + gain + re-encode
      // per row (the audio_gate cost model plus the encode side) —
      // growth must be codec-linear, payloads never shuffle
      "audio_normalize" -> (n => {
        implicit val s: org.apache.spark.sql.SparkSession = spark
        graft.ext.Multimodal.audioStats(
          graft.ext.Multimodal.normalizeAudio(
            graft.ext.Multimodal.syntheticWavClasses(docsAt(n))))
      }),
      // structured page metadata (t57): three regexp_extract
      // projections per page, no explode, no shuffle — pure scan cost
      "page_meta" -> (n => {
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><meta name=\"description\" content=\"s"), col("doc_id"),
          lit("\"><link rel=\"canonical\" href=\"https://e.com/"), col("doc_id"),
          lit("\"></head><body><p>"), col("text"), lit("</p></body></html>"))
        docsAt(n).select(col("doc_id"),
          TextOps.pageTitle(html).as("title"),
          TextOps.pageMetaDescription(html).as("description"),
          TextOps.pageCanonical(html).as("canonical"))
      }),
      // sitemap discovery (t60): robots directive parse + XML entry
      // extraction are narrow per-row regex work; the ×n distinct over
      // the FIXED mod-derived domain space is the only data-sized
      // stage, so growth must be distinct-scan-bound
      "sitemap_parse" -> (n =>
        graft.queries.Pipeline.sitemapDiscovery(docsAt(n))),
      // proximity search (t61): only the two probe terms' positions
      // leave the scan (term-frequency sized), then a doc-keyed
      // equi-join with the window filter — growth must be term-linear
      "proximity" -> (n => TextOps.proximityOccurrences(
        docsAt(n).select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(5)) === 0,
              lit(" quasar alpha beta pulsar")).otherwise(lit("")))
            .as("text")),
        "quasar", "pulsar", window = 3)),
      // domain boilerplate (t64): line explode + (domain, line)-keyed
      // df + doc-keyed reassembly — the ×n copies land in the SAME
      // mod-derived domain space, so the df key stays bounded and
      // growth must be line-linear
      "domain_boilerplate" -> (n => {
        val d = col("doc_id")
        val kk = pmod(d, lit(23)).cast("string")
        val domain = concat(lit("site"), kk,
          element_at(array(lit(".com"), lit(".org"), lit(".net")),
            (pmod(d, lit(3)) + 1).cast("int")))
        val page = concat(lit("Home | About site"), kk, lit("\n"), col("text"),
          lit("\nCopyright site"), kk, lit(" all rights reserved"))
        val lines = docsAt(n)
          .select(d, domain.as("domain"), posexplode(split(page, "\n")))
          .withColumnRenamed("col", "line")
        TextOps.dropDomainBoilerplate(lines, minDf = 3)
      }),
      // per-doc keywords (t65): the t62 weight build + a TopKPerKey
      // cut (no corpus-wide window) — growth must be token-linear
      "doc_keywords" -> (n => TextOps.docKeywords(docsAt(n), k = 3)),
      // t65 served from the persisted tf-idf artifact: keyword
      // extraction off the saturated integer grain — no corpus
      // re-tokenize; must beat the from-scratch arm in absolute time
      "keywords_indexed" -> (n => TextOps.docKeywordsAt(spark,
        tfidfIdx(n), k = 3)),
      // sparse tf-idf cosine (t62): one token-keyed shuffle builds
      // df/idf + norms, the dot aggregates only the query terms'
      // postings, top-k is a TakeOrdered — growth must be token-linear
      "tfidf_cosine" -> (n => TextOps.tfidfCosineTopK(docsAt(n),
        Seq("dup", "spark", "vector", "merge"), k = 20)),
      // audio silence trim (m16): one decode + bound scan + slice
      // re-encode per row (the audio_normalize cost model) — growth
      // must be codec-linear, payloads never shuffle
      "audio_trim" -> (n => {
        implicit val s: org.apache.spark.sql.SparkSession = spark
        graft.ext.Multimodal.audioStats(
          graft.ext.Multimodal.trimSilence(
            graft.ext.Multimodal.syntheticWavPadded(docsAt(n)), 100L))
      }),
      // epoch allocation (t63): the corpus scan builds the per-source
      // inventory (map-side combined at FIXED source cardinality); the
      // allocator itself is source-sized arithmetic — scan-bound
      "epoch_alloc" -> (n => graft.ops.Sampling.epochAllocation(
        docsAt(n).groupBy(col("source"))
          .agg(sum(TextOps.tokenCount(col("text")).cast("long"))
            .as("tokens_avail")))),
      // g10: the harvest is a narrow per-page projection and the graph
      // after the rollup lives at DOMAIN cardinality — ×n multiplies
      // pages, not domains (the mod formulas land every copy in the
      // same ~100-domain space), so the rank iterations cost O(1) and
      // growth must be harvest-scan-bound
      "domain_pagerank" -> (n => {
        val pairs = graft.queries.Pipeline.syntheticPageLinkDomains(docsAt(n))
        val edges = pairs
          .groupBy(col("page_domain").as("src"), col("domain").as("dst"))
          .agg(count(lit(1)).cast("long").as("w"))
        val nodes = pairs.select(col("page_domain").as("id"))
          .unionByName(pairs.select(col("domain").as("id"))).distinct()
        graft.ops.Graph.pageRankWeighted(nodes, edges, iters = 3)
      }),
      // g11: same harvest + domain-cardinality rollup as
      // domain_pagerank, then two HITS iterations whose half-steps
      // (weighted sum + 1-row L1 normalizer) live at domain
      // cardinality — growth must stay harvest-scan-bound
      "hits" -> (n => {
        val pairs = graft.queries.Pipeline.syntheticPageLinkDomains(docsAt(n))
        val edges = pairs
          .groupBy(col("page_domain").as("src"), col("domain").as("dst"))
          .agg(count(lit(1)).cast("long").as("w"))
        val nodes = pairs.select(col("page_domain").as("id"))
          .unionByName(pairs.select(col("domain").as("id"))).distinct()
        graft.ops.Graph.hits(nodes, edges, iters = 2)
      }),
      // warm-start rank maintenance (g13): harvest/rollup of the
      // CURRENT snapshot (page-linear) + 2 warm rounds off the
      // persisted vector — the domain space is fixed under ×n, so the
      // rank rounds cost O(1) and growth must be harvest-scan-bound
      // (the from-uniform alternative pays the full convergence depth)
      "rank_warm_update" -> (n => {
        val pairs = graft.queries.Pipeline.syntheticPageLinkDomains(docsAt(n))
        val edges = pairs
          .groupBy(col("page_domain").as("src"), col("domain").as("dst"))
          .agg(count(lit(1)).cast("long").as("w"))
        val nodes = pairs.select(col("page_domain").as("id"))
          .unionByName(pairs.select(col("domain").as("id"))).distinct()
        graft.ops.Graph.pageRankWeightedFrom(nodes, edges,
          graft.ops.RankIndex.ranksAt(spark, rankIdx(n)), iters = 2)
      }),
      // freshness-weighted recrawl schedule (t66): the dated-entry
      // table is sitemap-entry cardinality (domain-fixed under ×n),
      // the rank join a domain-cardinality broadcast — the ×n-linear
      // stages are the directive distinct and the rank harvest, so
      // growth must be scan-bound like domain_pagerank
      "recrawl_schedule" -> (n =>
        graft.queries.Pipeline.recrawlTable(docsAt(n))),
      // bounded-depth sitemap-tree walk (t60c): payload synthesis +
      // three fetch-join levels, all at domain×sitemap-file
      // cardinality — the only ×n-linear stage is the directive
      // table's distinct over the grown doc scan, so growth must be
      // scan-bound
      "sitemap_tree" -> (n =>
        graft.queries.Pipeline.sitemapTreeDiscovery(docsAt(n))),
      // WARC ingestion (t53): container injection + ONE codegen
      // Content-Length byte walk per crawl file, records out at
      // record cardinality, no shuffle — growth must be pure scan
      // (container-bytes-linear) cost
      "warc_parse" -> (n => TextOps.warcRecords(
        graft.queries.Pipeline.syntheticWarcPages(docsAt(n)))),
      // anchor-text rollup (t54): narrow extract/split/tokenize per
      // page, then ONE rollup keyed at (domain, term) cardinality —
      // the mod formulas keep the key space fixed under ×n, so growth
      // must be harvest-scan-bound
      "anchor_terms" -> (n =>
        graft.queries.Pipeline.syntheticAnchorTermPairs(docsAt(n))
          .groupBy(col("domain"), col("term"))
          .agg(count(lit(1)).as("n_links"),
            count_distinct(col("doc_id")).as("n_pages"))),
      // crawl-frontier scheduler (t55): harvest → robots filter →
      // first-seen URL dedup → rank join → per-domain budget; the two
      // TopKPerKey cuts shuffle once each on linear key spaces (URLs
      // carry doc_id), the rank join broadcasts at domain cardinality
      // — growth must be link-linear, never super-linear
      "crawl_frontier" -> (n => {
        val docs = docsAt(n)
        val allowed = graft.queries.Pipeline.robotsDecisionTable(docs)
          .filter(col("allowed"))
          .select(col("doc_id"), col("pos"), col("url_canon"), col("domain"))
        val firstSeen = graft.ops.TopK.perKey(allowed, Seq("url_canon"),
          Seq(("doc_id", false), ("pos", false)), 1)
        val joined = firstSeen
          .join(graft.queries.Pipeline.domainRanks(docs), Seq("domain"), "left")
          .select(col("domain"), col("url_canon"),
            coalesce(col("rank"), lit(0L)).as("domain_rank"),
            col("doc_id"), col("pos"))
        graft.ops.TopK.perKey(joined, Seq("domain"),
          Seq(("doc_id", false), ("pos", false), ("url_canon", false)), 3)
      }),
      // content-defined chunking: one codegen gear pass per row, no
      // shuffle — growth must be pure scan cost
      "cdc_chunks" -> (n => Dedup.chunkTable(docsAt(n))),
      // page processing (r15): HTML→text + link harvest as one narrow
      // regexp projection per page — growth must be pure scan cost
      "html_extract" -> (n => {
        val html = concat(
          lit("<html><head><script>var x = \"<p>no</p>\";</script></head><body><p>"),
          col("text"), lit("</p><a href=\"https://Example.com:443/d/"),
          col("doc_id"), lit("/\"></a><p>&amp; &#169;</p></body></html>"))
        docsAt(n).select(col("doc_id"),
          TextOps.htmlToText(html).as("text"),
          concat_ws("|", TextOps.htmlLinks(html)).as("links"))
      }),
      // sentence segmentation (r15): one narrow regexp_extract_all
      // pass, sentences out at sentence cardinality — scan-bound
      "sentences" -> (n => docsAt(n).select(col("doc_id"),
        posexplode(TextOps.sentences(
          regexp_replace(col("text"), lit(" (table|value|scan) "), lit(". ")))))),
      // classifier training: each iteration is one map-side-combined
      // aggregation collecting a single 6-value row — growth must be
      // scan-bound (two iterations timed, eager by construction)
      "perceptron_train" -> (n => {
        val f = graft.ext.Classify.textFeatures(docsAt(n))
          .withColumn("y", when(col("f3") * 2 >= col("f1"), 1L).otherwise(-1L))
        graft.ext.Classify.perceptronTrain(f,
          graft.ext.Classify.textFeatureCols, "y", iters = 2)
      }),
      // chunk-level provenance against a PREBUILT chunk store: fixed
      // ingest batch, corpus contribution = one streamed artifact scan
      // under a broadcast semi probe — never a corpus re-chunk
      "cdc_serve_indexed" -> (n => Dedup.chunkProvenanceIndexed(
        spark, chunkIdx(n), chunkBatch)),
      // label propagation over an ×n path graph (consecutive ids within
      // each salted copy): per round ONE src join + two dst-keyed aggs,
      // so growth must be edge-linear — iterative but never super-linear
      "lpa" -> (n => {
        val nodes = docsAt(n).select(col("doc_id").as("id"))
        val fwd = nodes.select(col("id").as("src"), (col("id") + 1L).as("dst"))
          .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.ops.Graph.labelPropagation(nodes, edges, iters = 2,
          materialize = false)
      }),
      // the pre-join skew advisor at ×n fact size: both sides collapse
      // to key-cardinality count tables (map-side combined), the join
      // never touches fact rows — growth must be pure scan cost
      "skew_report" -> (n => graft.ops.Skew.joinSkewReport(
        scaledBy(Tables.events(spark, sfDir), "event_id", n),
        scaledBy(Tables.events(spark, sfDir), "event_id", n),
        "user_id", targetRowsPerTask = 1000L, topN = 10)),
      // the advisor CLOSING its own loop (r12 verdict task 6): a
      // zipfian fact (10 % of all events collapse onto one hot user)
      // joins a dim too wide to broadcast (8 KB pad per user → ~12 MB,
      // above the 10 MB AQE threshold, so the join genuinely shuffles).
      // `plain` funnels the hot key's n/10 rows into ONE task;
      // `adaptive` spends the advisor's two count-aggs, then spreads
      // exactly the advised keys over their recommended salt_buckets.
      // The gated claim: adaptive per_row_ratio ≤ plain at ×k.
      "salted_join_plain" -> (n => skewedFact(n)
        .join(userPadDim, Seq("user_id"))
        .groupBy().agg(count(lit(1)).as("n"),
          sum(length(col("pad"))).as("pad_bytes"))),
      "salted_join_adaptive" -> (n => {
        val f = skewedFact(n)
        val rep = graft.ops.Skew.joinSkewReport(f, userPadDim, "user_id",
          targetRowsPerTask = 5000L, topN = 10)
        graft.ops.Skew.adaptiveSaltedJoin(f, userPadDim, "user_id", rep)
          .groupBy().agg(count(lit(1)).as("n"),
            sum(length(col("pad"))).as("pad_bytes"))
      }),
    )
    val out = probeRows(probes, k)
    chunkBatch.unpersist(blocking = false)
    ivfIdx.values.foreach { case (cb, lists) =>
      cb.unpersist(blocking = false); lists.unpersist(blocking = false)
    }
    mhIdx.values.foreach(_.unpersist(blocking = false))
    lshIdx.values.foreach(_.unpersist(blocking = false))
    lexArmFixed.unpersist(blocking = false)
    dirtyParts.unpersist(blocking = false)
    userPadDim.unpersist(blocking = false)
    out
  }

  /** ×1-vs-×100 probe for the INDEXED serving family only (r14 verdict
    * task 6): the flat-per-batch-cost claim for artifact-backed serving
    * was measured only at ×10 — one more decade either confirms the
    * asymptote or exposes a hidden corpus-bound term the first decade
    * hid in fixed job overhead. Only the six cheap arms run here: each
    * is an index PROBE (probe hashing / token slice / prefix join /
    * broadcast semi scan), so the timed cost is per-batch, and the ×100
    * index builds are amortized setup exactly as production amortizes
    * them. Done-bar: every arm's ×100 per_row_ratio ≤ its ×10 ratio
    * (per-row cost must keep FALLING as fixed overhead amortizes).
    */
  private def serveProbe100(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, k: Int): String = {
    import graft.ext.{Dedup, Similarity, TextOps}
    def docsAt(n: Int) = scaledBy(Tables.documents(spark, sfDir), "doc_id", n)
    def embAt(n: Int) = scaledBy(Tables.embeddings(spark, sfDir), "vec_id", n)
    def queries(n: Int) = embAt(n).filter(col("vec_id") < 20)
    def partsAt(n: Int) = scaledBy(Tables.part(spark, sfDir), "p_partkey", n)
      .select(col("p_partkey").as("id"),
        concat(col("p_name"), lit("-"), col("p_brand"), lit("-"),
          col("p_size").cast("string")).as("s"))
    val dirtyParts = {
      val base = partsAt(1).filter(col("id") < 1000000000L && col("id") % 30 === 0)
      val pos = (conv(substring(md5(col("s")), 1, 4), 16, 10).cast("long")
        % length(col("s"))).cast("int")
      val d = base.select(col("id"),
        concat(col("s").substr(lit(1), pos),
          col("s").substr(pos + lit(2), length(col("s")))).as("s")).persist()
      d.count()
      d
    }
    val chunkBatch = {
      val b = docsAt(1)
        .filter(col("doc_id") < 1000000000L && col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000000000L).as("doc_id"),
          concat(lit("EDIT >> "), col("text")).as("text")).persist()
      b.count()
      b
    }
    val ivfIdx: Map[Int, (DataFrame, DataFrame)] = Seq(1, k).map { n =>
      val (cb, lists) = Similarity.ivfIndex(embAt(n), 16)
      val cbC = cb.persist(); val listsC = lists.persist()
      cbC.count(); listsC.count()
      n -> ((cbC: DataFrame, listsC: DataFrame))
    }.toMap
    val lshParams = graft.ext.Similarity.LshParams(64, 12, 4, 1000L)
    val lshIdx: Map[Int, DataFrame] = Seq(1, k).map { n =>
      val idx = Similarity.lshIndex(embAt(n), lshParams.dim,
        lshParams.bitsPerTable, lshParams.tables, lshParams.seedBase).persist()
      idx.count()
      n -> idx
    }.toMap
    val lexArmFixed = spark.range(20).selectExpr("id AS query_id")
      .crossJoin(spark.range(1, 11).selectExpr("id AS rank"))
      .selectExpr("query_id", "query_id * 3 + rank * 7 AS doc_id", "rank")
      .persist()
    lexArmFixed.count()
    val fuzzyIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_fuzzy100")
        .toFile.getAbsolutePath + "/catalog"
      graft.ext.Fuzzy.writeCatalogIndex(partsAt(n), p, maxDist = 2)
      n -> p
    }.toMap
    val ivfPqIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_ivfpq100")
        .toFile.getAbsolutePath + "/ivfpq"
      Similarity.writeIvfPqIndex(embAt(n), p, nLists = 16, m = 4, k = 8, iters = 2)
      n -> p
    }.toMap
    val textIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_text100")
        .toFile.getAbsolutePath + "/ti"
      TextOps.writeTextIndex(docsAt(n), p)
      n -> p
    }.toMap
    val tfidfIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_tfidf100")
        .toFile.getAbsolutePath + "/tfi"
      TextOps.writeTfidfIndex(docsAt(n), p)
      n -> p
    }.toMap
    val chunkIdx: Map[Int, String] = Seq(1, k).map { n =>
      val p = java.nio.file.Files.createTempDirectory("graft_bench_chunks100")
        .toFile.getAbsolutePath + "/ci"
      Dedup.writeChunkIndex(docsAt(n), p)
      n -> p
    }.toMap
    val probes: Seq[(String, Int => DataFrame)] = Seq(
      "ivf_serve_indexed" -> (n => Similarity.ivfTopK(queries(n), embAt(n), k = 5,
        nProbe = 4, corpusIndex = Some(ivfIdx(n)))),
      "hybrid_serve" -> { n =>
        val sem = Similarity.lshTopKIndexed(
            embAt(n).filter(col("vec_id") < 20), lshIdx(n), 50, lshParams)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Similarity.rrfFusePerQuery(Seq(sem, lexArmFixed), k = 10)
      },
      "bm25_indexed" -> (n => TextOps.bm25ServeIndexed(spark, textIdx(n),
        Seq("dup", "spark", "vector", "merge"), k = 20)),
      "tfidf_serve_indexed" -> (n => TextOps.tfidfCosineTopKAt(spark,
        tfidfIdx(n), Seq("dup", "spark", "vector", "merge"), k = 20)),
      "fuzzy_serve_indexed" -> (n => graft.ext.Fuzzy.fuzzyJoinIndexed(
        spark, dirtyParts, fuzzyIdx(n))),
      "cdc_serve_indexed" -> (n => Dedup.chunkProvenanceIndexed(
        spark, chunkIdx(n), chunkBatch)),
      "ivfpq_serve_indexed" -> (n => Similarity.ivfPqTopKAt(
        spark, queries(n), k = 5, ivfPqIdx(n), nProbe = 4)))
    val out = probeRows(probes, k)
    chunkBatch.unpersist(blocking = false)
    dirtyParts.unpersist(blocking = false)
    lexArmFixed.unpersist(blocking = false)
    ivfIdx.values.foreach { case (cb, lists) =>
      cb.unpersist(blocking = false); lists.unpersist(blocking = false)
    }
    lshIdx.values.foreach(_.unpersist(blocking = false))
    out
  }

  /** ×1-vs-×100 DOMAIN-SPACE probe for the iterative graph family
    * (r16 verdict task 8): the suite's fixture keeps the domain space
    * FIXED under id-salting (the mod-formula domains), so the g10–g13
    * probes above only show harvest-scan growth — they cannot show
    * what the r16 checkpoint pattern costs when the GRAPH ITSELF grows
    * off-fixture. Here the graph is synthetic and dense-ish (8
    * out-edges per node, weight 1–7) and the node count grows ×k: per
    * iteration the operators are two edge/node-cardinality shuffles,
    * so per_row_ratio (t(×k) / (k·t(×1))) must stay ≤ ~1 — a ratio
    * ≫ 1 would mean the checkpoint/loop machinery hides a
    * super-linear or driver-side term that the fixed-domain fixture
    * masked. Arms mirror g10 (weighted rank), g11 (HITS) and g13
    * (warm-start rank); convergence-detected variants are excluded on
    * purpose — their round count varies with the graph, which would
    * confound the ratio.
    */
  private def graphProbe100(spark: org.apache.spark.sql.SparkSession,
      k: Int): String = {
    import graft.ops.Graph
    val baseN = 10000L
    def nodesAt(n: Int) = spark.range(baseN * n).select(col("id"))
    def edgesAt(n: Int) = {
      val nn = baseN * n
      spark.range(nn).select(col("id").as("src"),
          explode(array((0 until 8).map(j =>
            pmod(col("id") * (2 * j + 3) + j, lit(nn))): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .withColumn("w", pmod(col("src") + col("dst"), lit(7)) + lit(1))
    }
    val out = probeRows(Seq(
      "rank_dense_domains" -> (n =>
        Graph.pageRankWeighted(nodesAt(n), edgesAt(n), iters = 3)),
      "hits_dense_domains" -> (n =>
        Graph.hits(nodesAt(n), edgesAt(n), iters = 2)),
      "rank_warm_dense_domains" -> (n =>
        Graph.pageRankWeightedFrom(nodesAt(n), edgesAt(n),
          nodesAt(n).select(col("id"),
            (lit(900000L) + pmod(col("id"), lit(200000L))).as("rank")),
          iters = 2))), k)
    graft.ops.Blocks.sweep(spark) // reclaim the arms' loop checkpoints
    out
  }

  private def probeRows(probes: Seq[(String, Int => DataFrame)], k: Int): String = {
    val rows = probes.flatMap { case (name, fn) =>
      try {
        // warm BOTH plan shapes: the ×k plan generates different code
        // (union width, partition count) than ×1 — a cold ×k first run
        // once read as a spurious per_row_ratio > 1 on a mapPartitions
        // arm whose warmed ratio is ~0.7
        runToNoop(fn(1)); runToNoop(fn(k))
        // min-of-2: a probe arm is a single measurement, so one GC/OS
        // hiccup on the ×k run once turned a 0.18 arm into a 2.8
        // per-row "super-linear" red herring — min is the right
        // statistic for interference on a deterministic workload
        val t1 = math.min(timeSec(runToNoop(fn(1))), timeSec(runToNoop(fn(1))))
        val tk = math.min(timeSec(runToNoop(fn(k))), timeSec(runToNoop(fn(k))))
        val ratio = tk / (k * math.max(1e-3, t1))
        Some(f""""$name":{"x1":$t1%.3f,"x$k":$tk%.3f,"per_row_ratio":$ratio%.3f}""")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scale probe $name failed: ${e.getMessage}")
        None
      }
    }
    s"""{"factor":$k,${rows.mkString(",")}}"""
  }

  /** ×1-vs-×k probe for the pair-GENERATING dedup family (d02 naive
    * all-shared-shingles join, d09 PPJoin prefix filter, d03 MinHash
    * banding), which the serving probe above deliberately excludes.
    *
    * The ×k corpus here is ZIPFIAN-salted, not plain id-salted: each of
    * the k copies rewrites every content token with a copy-unique
    * prefix (so cross-copy documents share no content shingles and the
    * TRUE pair set grows exactly linearly — each copy reproduces the
    * ×1 pairs under renamed ids), and every document in every copy gets
    * the same appended boilerplate tail (high-df shingles shared by the
    * whole ×k corpus, far too few to lift any cross-copy Jaccard near
    * the 0.5 threshold). That is the shape web corpora actually have —
    * a head of boilerplate shingles whose document frequency grows with
    * the corpus — and it is exactly what separates the strategies:
    * d02's candidate join fans in quadratically on the boilerplate
    * keys, while d09 keeps boilerplate out of the rarest-shingle
    * prefixes, so its per-row cost should hold roughly flat. The
    * expected artifact signature is d09's per_row_ratio well below
    * d02's at ×k — the crossover the PPJoin scaladoc promises, measured
    * rather than asserted.
    *
    * The probe base is a fixed ~1/16 document sample: the ×k naive arm
    * is intentionally quadratic, and the probe only needs enough volume
    * for the ratios to separate, not a minutes-long demonstration.
    *
    * d03 runs twice, at the registry's gate parameters (bands=16 →
    * 2 rows/band) and at a wide-band setting (bands=8 → 4 rows/band).
    * The narrow gate banding collides the ~0.1-Jaccard boilerplate
    * tail at ~s² per band, so its candidate set fans in quadratically
    * on a zipfian corpus (measured per_row_ratio > 1 at ×10) — the
    * gate tuning buys recall at the 0.5 threshold, not scale. Wide
    * bands collide the same tail at ~s⁴ and stay linear; banding
    * width, not MinHash itself, is the 100 TB lever.
    */
  private def pairProbe(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, k: Int): String = {
    import graft.ext.Dedup
    val boiler = " all rights reserved terms of service privacy policy contact us subscribe to our newsletter"
    def zipfDocs(nCopies: Int): DataFrame = {
      val base = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 16 === 0)
        .select(col("doc_id"), col("text"))
      (0 until nCopies).map { i =>
        base.select(
          (col("doc_id") + lit(i * 1000000000L)).as("doc_id"),
          concat(regexp_replace(col("text"), "(\\w+)", s"c$i$$1"), lit(boiler)).as("text"))
      }.reduce(_.unionByName(_))
    }
    probeRows(Seq(
      "pairs_naive_d02" -> (n => Dedup.ngramJaccardPairs(
        zipfDocs(n), n = 3, minJaccard = 0.5)),
      "pairs_ppjoin_d09" -> (n => Dedup.ngramJaccardPairs(
        zipfDocs(n), n = 3, minJaccard = 0.5, prefixFilter = true, broadcastDf = true)),
      "pairs_minhash_d03" -> (n => Dedup.minhashDedupPairs(
        zipfDocs(n), n = 3, k = 32, bands = 16, minJaccard = 0.5)),
      "pairs_minhash_d03_wide" -> (n => Dedup.minhashDedupPairs(
        zipfDocs(n), n = 3, k = 32, bands = 8, minJaccard = 0.5)),
      // the d13 family: the naive containment join fans in on the
      // boilerplate head exactly like d02; the asymmetric prefix
      // strategy keeps high-df tokens off the PROBE side
      "cont_naive_d13" -> (n => Dedup.ngramContainmentPairs(
        zipfDocs(n), n = 3, minContainment = 0.6)),
      "cont_prefix_d13" -> (n => Dedup.ngramContainmentPairs(
        zipfDocs(n), n = 3, minContainment = 0.6,
        prefixFilter = true, broadcastDf = true)),
      // dHash modality chain at constant dup-group size: classes scale
      // WITH the corpus (50·n) so the true pair set stays linear and
      // the probe measures whether codec + banded pairing stay linear
      // as the corpus grows — the image-ingest scaling question
      "pairs_dhash_d15" -> { n =>
        implicit val s: org.apache.spark.sql.SparkSession = spark
        val base = Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 16 === 0).select(col("doc_id"))
        val docsN = (0 until n).map(i =>
            base.select((col("doc_id") + lit(i * 1000000000L)).as("doc_id")))
          .reduce(_.unionByName(_))
        graft.ext.Multimodal.dhashPairs(
          graft.ext.Multimodal.imageDhash(
            graft.ext.Multimodal.syntheticPngClasses(docsN, classes = 50 * n)),
          maxDist = 3)
      },
    ), k)
  }
}
