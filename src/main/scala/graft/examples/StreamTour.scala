package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.{EventsStream, StreamingAsOf}

/** End-to-end tour of the streaming surface against the events fixture
  * replayed through the file-stream source: windowed aggregation,
  * bounded-state dedup, stream-stream interval join, the stateful
  * streaming as-of, index-backed dedup + PQ/ADC similarity serving,
  * and the cross-batch heavy-hitter summary — each checked against
  * its batch twin.
  * Run: `sbt "runMain graft.examples.StreamTour"` — prints one OK/FAIL
  * line per operator and exits nonzero on any FAIL.
  */
object StreamTour {
  def main(args: Array[String]): Unit = {
    implicit val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var failed = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch { case e: Throwable => println(s"  ! $name: $e"); false }
      println(f"${if (ok) "OK  " else "FAIL"} $name")
      if (!ok) failed += 1
    }
    def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
        mode: String): org.apache.spark.sql.DataFrame = {
      val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
    }

    val dir = EventsStream.stageFixture(spark, sf)

    check("tumbling windows equal batch") {
      // stream==batch equality via symmetric exceptAll over the memory
      // sink table — no driver materialization of the full window set
      val streamed = runToMemory(EventsStream.tumbling(EventsStream.read(spark, dir)),
        "tour_tumbling", "complete")
        .select(col("window.start"), col("event_type"), col("cnt"))
      val batch = EventsStream.tumblingBatch(spark, sf)
        .select(col("window.start"), col("event_type"), col("cnt"))
      streamed.count() > 0 &&
        streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty
    }

    check("bounded-state dedup removes nothing from an already-unique stream") {
      val n = runToMemory(EventsStream.dedupedStream(EventsStream.read(spark, dir)),
        "tour_dedup", "append").count()
      n == spark.read.parquet(s"$sf/events.parquet").count()
    }

    check("interval join equals batch") {
      val streamed = runToMemory(
        EventsStream.clickToPurchaseJoin(EventsStream.read(spark, dir)),
        "tour_ssjoin", "append")
        .select("purchase_id", "click_id").dropDuplicates()
      val batch = EventsStream.clickToPurchaseBatch(spark, sf)
        .select("purchase_id", "click_id").dropDuplicates()
      streamed.count() > 0 &&
        streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty
    }

    check("streaming as-of matches batch on matured ticks") {
      val src = StreamingAsOf.clickViewTicks(EventsStream.read(spark, dir))
      val q = StreamingAsOf.joinBackward(src)
        .writeStream.outputMode("append").format("memory").queryName("tour_sasof").start()
      val streamed = try {
        StreamingAsOf.drainToFixpoint(q, () => spark.table("tour_sasof").count())
        spark.table("tour_sasof").collect()
          .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      } finally q.stop()
      val batch = StreamingAsOf.clickViewBatch(spark, sf)
      streamed.nonEmpty && streamed.forall { case (id, m) => batch(id) == m }
    }

    check("streaming forward as-of honors its lookahead tolerance") {
      val tol = 30L * 60 * 1000000 // 30 min lookahead
      val src = StreamingAsOf.clickViewTicks(EventsStream.read(spark, dir))
      val q = StreamingAsOf.joinForward(src, tol)
        .writeStream.outputMode("append").format("memory").queryName("tour_fasof").start()
      val streamed = try {
        StreamingAsOf.drainToFixpoint(q, () => spark.table("tour_fasof").count())
        spark.table("tour_fasof").collect()
          .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      } finally q.stop()
      val ev = graft.Tables.events(spark, sf).withColumn("us", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("us"), col("event_id").as("view_id"))
      val batch = graft.ops.AsOf.joinForward(clicks, views, Seq("user_id"), "us", "us",
          Seq("view_id"), tolerance = Some(tol)).collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      streamed.nonEmpty && streamed.forall { case (id, m) => batch(id) == m }
    }

    check("streaming page processing (extract + links) equals the batch projection") {
      // crawl ingest as a stream: pages arrive, HTML→text extraction
      // and link harvesting run as the SAME stateless codegen
      // projection the batch gate (t46/t48) proves — streaming needs
      // no operator changes, only a sink
      implicit val sql = spark.sqlContext
      import graft.ext.TextOps
      val pages = graft.Tables.documents(spark, sf)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), concat(
          lit("<html><head><script>var x = \"<p>leak</p>\";</script></head><body><p>"),
          col("text"), lit("</p><a href=\"https://Example.com:443/d/"), col("doc_id"),
          lit("/\"></a><p>&amp; &#169;</p></body></html>")).as("html"))
      def project(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        TextOps.htmlToText(col("html")).as("text"),
        concat_ws("|", TextOps.htmlLinks(col("html"))).as("links"))
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val streamed = {
        val q = project(input.toDF().toDF("doc_id", "html"))
          .writeStream.outputMode("append").format("memory")
          .queryName("tour_pages").start()
        try {
          input.addData(pages.as[(Long, String)].collect().toIndexedSeq)
          q.processAllAvailable()
        } finally q.stop()
        spark.table("tour_pages")
      }
      val batch = project(pages)
      streamed.count() > 0 &&
        streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty
    }

    check("streaming dedup against the persisted minhash index equals the batch operator") {
      // online ingest: documents arrive as a stream, near-dups are found
      // by probing the parquet signature index built offline
      implicit val sql = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("tour_sdedup")
        .toFile.getAbsolutePath
      val docs = graft.Tables.documents(spark, sf)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      graft.ext.Dedup.writeMinhashIndex(corpus, s"$root/idx", n = 3, k = 32, bands = 16)
      val idx = graft.ext.Dedup.readMinhashIndex(spark, s"$root/idx")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.start(
        input.toDF().toDF("doc_id", "text"), corpus, idx,
        s"$root/out", s"$root/ckpt", n = 3, k = 32, bands = 16, minJaccard = 0.5)
      try {
        input.addData(batch.select("doc_id", "text").as[(Long, String)].collect().toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$root/out")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = graft.ext.Dedup.minhashDedupNewPairs(batch, corpus,
          n = 3, k = 32, bands = 16, minJaccard = 0.5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      streamed.nonEmpty && streamed == expected
    }

    check("continuous labeling folds streamed pairs; a late bridge merges clusters exactly as batch") {
      // the tail of the streaming-dedup chain: pairs found per
      // micro-batch fold into a PERSISTED labeling at |labels|+|batch|
      // cost — the corpus pair set is never re-propagated
      implicit val sql = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("tour_sclusters")
        .toFile.getAbsolutePath
      val docs = graft.Tables.documents(spark, sf)
      val pairs = graft.ext.Dedup.ngramJaccardPairs(docs, 3, 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      val (b1, b2) = pairs.zipWithIndex.partition(_._2 % 2 == 0)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val q = graft.streaming.StreamingClusters.startAt(
        input.toDF().toDF("id_a", "id_b"), s"$root/labels", s"$root/ckpt")
      try {
        input.addData(b1.map(_._1).toIndexedSeq)
        q.processAllAvailable()
        input.addData(b2.map(_._1).toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$root/labels").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.ext.Dedup.clusters(pairs.toSeq.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      streamed.nonEmpty && streamed == batch
    }

    check("PQ ADC serving from a swapped-in index equals the batch operator") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_pq")
        .toFile.getAbsolutePath
      val emb = graft.Tables.embeddings(spark, sf)
      graft.ext.IndexLifecycle.rebuildPqIndex(emb, s"$root/pq", m = 4, k = 8, iters = 1)
      val probes = emb.filter(col("vec_id") < 5)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.StreamingSimilarity.startAtPq(
        input.toDF().toDF("vec_id", "embedding"), s"$root/pq", k = 5,
        s"$root/out", s"$root/ckpt")
      try {
        input.addData(probes.select("vec_id", "embedding")
          .as[(Long, Array[Float])].collect().toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$root/out")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = graft.ext.Similarity.pqTopKAt(spark, probes, k = 5, s"$root/pq")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      streamed.nonEmpty && streamed == expected
    }

    check("hybrid RRF serving from the persisted LSH index equals the batch composition") {
      // the RAG serving tail online: semantic arm off the parquet LSH
      // index, static lexical arm, reciprocal-rank fusion per micro-batch
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_hybrid")
        .toFile.getAbsolutePath
      val emb = graft.Tables.embeddings(spark, sf)
      graft.ext.Similarity.writeLshIndex(emb, s"$root/lsh", 64, 6, 8, 777L)
      val lexArm = spark.range(5).select(col("id").as("query_id"))
        .crossJoin(spark.range(1, 6).select(col("id").as("rank")))
        .select(col("query_id"), (col("query_id") * 3 + col("rank") * 7).as("doc_id"),
          col("rank")).cache()
      val probes = emb.filter(col("vec_id") < 5)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.StreamingSimilarity.startAtHybrid(
        input.toDF().toDF("vec_id", "embedding"), s"$root/lsh", lexArm, k = 5,
        s"$root/out", s"$root/ckpt")
      try {
        input.addData(probes.select("vec_id", "embedding")
          .as[(Long, Array[Float])].collect().toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$root/out")
        .select("query_id", "doc_id", "rrf_micro", "n_arms", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val p = graft.ext.Similarity.readLshIndexParams(spark, s"$root/lsh").get
      val sem = graft.ext.Similarity.lshTopKIndexed(probes,
          graft.ext.Similarity.readLshIndex(spark, s"$root/lsh"), 50, p)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      val lex = lexArm.join(probes.select(col("vec_id").as("query_id")),
        Seq("query_id"), "left_semi")
      val expected = graft.ext.Similarity.rrfFusePerQuery(Seq(sem, lex), k = 5)
        .select("query_id", "doc_id", "rrf_micro", "n_arms", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      streamed.nonEmpty && streamed == expected
    }

    check("streaming entity match against the persisted catalog index equals the batch operator") {
      // online record linkage: scraped/typo'd records resolved per
      // micro-batch against the swap-aware catalog index
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_fuzzy")
        .toFile.getAbsolutePath
      val cat = graft.Tables.part(spark, sf).select(col("p_partkey").as("id"),
        concat(col("p_name"), lit("-"), col("p_brand"), lit("-"),
          col("p_size").cast("string")).as("s"))
      graft.ext.Fuzzy.writeCatalogIndex(cat, s"$root/catalog", maxDist = 2)
      val pos = (conv(substring(md5(col("s")), 1, 4), 16, 10).cast("long")
        % length(col("s"))).cast("int")
      val dirty = cat.filter(col("id") % 5 === 0).select(col("id"),
        concat(col("s").substr(lit(1), pos),
          col("s").substr(pos + lit(2), length(col("s")))).as("s"))
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingFuzzy.startAt(
        input.toDF().toDF("id", "s"), s"$root/catalog", s"$root/out", s"$root/ckpt")
      try {
        input.addData(dirty.as[(Long, String)].collect().toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select("id_a", "match_id", "dist", "n_candidates").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
      val streamed = rows(spark.read.parquet(s"$root/out"))
      streamed.nonEmpty &&
        streamed == rows(graft.ext.Fuzzy.entityMatchIndexed(spark, dirty, s"$root/catalog"))
    }

    check("continuous distinct sketch equals the batch sketch of the whole stream") {
      // "how many distinct documents has this crawl seen" with k rows
      // of state: mergeability makes the running artifact EQUAL the
      // batch sketch of everything ingested
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_kmv")
        .toFile.getAbsolutePath
      val texts = graft.Tables.documents(spark, sf)
        .select(col("text")).as[String].collect()
      val (h1, h2) = texts.splitAt(texts.length / 2)
      graft.ops.Approx.writeKmvSketch(h1.toSeq.toDF("v"), col("v"), 64, s"$root/sketch")
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val q = graft.streaming.StreamingKmv.start(
        input.toDF().toDF("v"), "v", s"$root/sketch", s"$root/out", s"$root/ckpt")
      try {
        input.addData(h2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(s"$root/sketch")
        .orderBy(col("h")).collect().map(_.getLong(0)).toSeq
      val batch = graft.ops.Approx.kmvSketch(texts.toSeq.toDF("v"), col("v"), 64)
        .collect().map(_.getLong(0)).toSeq
      streamed == batch
    }

    check("cross-batch heavy-hitter summary equals exact counts of the whole stream") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_hh")
        .toFile.getAbsolutePath
      val toks = graft.Tables.documents(spark, sf)
        .select(explode(graft.ext.TextOps.tokens(lower(col("text")))).as("token"))
        .filter(col("token") =!= "").as[String].collect()
      val (h1, h2) = toks.splitAt(toks.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val q = graft.streaming.StreamingHeavyHitters.startAt(
        input.toDF().toDF("token"), "token", s"$root/state", s"$root/ckpt",
        capacity = 1024)
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val st = spark.read.parquet(s"$root/state")
      st.agg(sum("est")).head().getLong(0) == toks.length &&
        st.agg(max("err")).head().getLong(0) == 0L
    }

    check("continuous count-min sketch equals the batch sketch; point estimates never under") {
      // "how often has the crawl seen THIS key" with depth×width cells
      // of state: counters are sums, so the folded sketch EQUALS the
      // batch sketch of everything ingested — no streaming error term
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_cms")
        .toFile.getAbsolutePath
      val toks = graft.Tables.documents(spark, sf)
        .select(explode(graft.ext.TextOps.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "").as[String].collect()
      val (h1, h2) = toks.splitAt(toks.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val q = graft.streaming.StreamingCms.startAt(
        input.toDF().toDF("token"), "token", s"$root/state", s"$root/ckpt",
        depth = 4, width = 256)
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val state = spark.read.parquet(s"$root/state")
      val whole = graft.ops.Approx.cmsSketch(
        toks.toSeq.toDF("token"), "token", depth = 4, width = 256)
      val exact = toks.groupBy(identity).map { case (t, ts) => t -> ts.length.toLong }
      val est = graft.ops.Approx.cmsEstimate(state,
          toks.distinct.toSeq.toDF("token"), "token", depth = 4, width = 256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      state.exceptAll(whole).isEmpty && whole.exceptAll(state).isEmpty &&
        exact.forall { case (t, c) => est(t) >= c }
    }

    check("continuous inverted index equals the batch build; retrieval off it matches from-scratch") {
      // a crawler stream folds into the persisted text index; BM25
      // served off the folded artifact equals the from-scratch pass
      // over everything ingested
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_ti")
        .toFile.getAbsolutePath
      val docs = graft.Tables.documents(spark, sf)
      val rows = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect()
      val (h1, h2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingTextIndex.startAt(
        input.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val terms = Seq("dup", "spark", "vector", "merge")
      val served = graft.ext.TextOps.bm25ServeIndexed(
        spark, s"$root/state", terms, k = 20)
      val scratch = graft.ext.TextOps.bm25TopK(docs, terms, k = 20)
      served.exceptAll(scratch).isEmpty && scratch.exceptAll(served).isEmpty
    }

    check("continuous funnel equals the batch layered-minima query on everything ingested") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val all = graft.Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .collect()
        .map(r => graft.streaming.StreamingFunnel.Ev(r.getLong(0),
          new java.sql.Timestamp(r.getLong(1) / 1000000L), r.getLong(1),
          r.getLong(2), r.getString(3)))
      val (h1, h2) = all.partition(_.eventId % 2 == 0)
      val maxSec = all.map(_.tsNanos).max / 1000000000L
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.StreamingFunnel.Ev]
      val evs = input.toDS().withWatermark("ts", "30 days")
        .as[graft.streaming.StreamingFunnel.Ev]
      val q = graft.streaming.StreamingFunnel.funnel(evs)
        .writeStream.outputMode("update").format("memory")
        .queryName("tour_funnel").start()
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
        input.addData(graft.streaming.StreamingFunnel.Ev(999999L,
          new java.sql.Timestamp((maxSec + 62L * 86400) * 1000), 0L, 0L, "noop"))
        graft.streaming.StreamingAsOf.drainToFixpoint(
          q, () => spark.table("tour_funnel").count())
      } finally q.stop()
      val got = spark.table("tour_funnel").filter(col("userId") =!= 999999L)
        .groupBy("userId")
        .agg(min("firstView").as("first_view"), min("firstClick").as("first_click"),
          min("firstPurchase").as("first_purchase"), max("stage").as("stage"))
        .withColumnRenamed("userId", "user_id")
      val batch = graft.queries.Pipeline.all("e11_funnel")(spark, sf)
      got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty
    }

    check("continuous chunk store equals the batch build; provenance off it matches from-scratch") {
      // a crawler stream folds into the persisted chunk store; an
      // ingest batch screened against the folded artifact gets the
      // same (n_chunks, n_seen) answer as a from-scratch re-chunk of
      // everything ingested
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_chunks")
        .toFile.getAbsolutePath
      val docs = graft.Tables.documents(spark, sf)
      val rows = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect()
      val (h1, h2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingChunks.startAt(
        input.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val probe = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("EDIT >> "), col("text")).as("text"))
      val served = graft.ext.Dedup.chunkProvenanceIndexed(spark, s"$root/state", probe)
      val scratch = graft.ext.Dedup.chunkProvenance(probe, docs)
      served.exceptAll(scratch).isEmpty && scratch.exceptAll(served).isEmpty
    }

    check("continuous histogram equals the batch sketch; served quantiles bracket the exact") {
      // "where does the p99 document length sit RIGHT NOW" from ≤
      // buckets cells of state: counters are sums, so the folded
      // sketch EQUALS the batch sketch of everything ingested, and
      // brackets served off it keep the one-bin-width guarantee
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_hist")
        .toFile.getAbsolutePath
      val lens = graft.Tables.documents(spark, sf)
        .select(col("n_chars")).as[Long].collect()
      val (h1, h2) = lens.splitAt(lens.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = graft.streaming.StreamingHist.startAt(
        input.toDF().toDF("n_chars"), "n_chars", s"$root/state", s"$root/ckpt",
        lo = 0L, hi = 640L, buckets = 64)
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val state = spark.read.parquet(s"$root/state")
      val whole = graft.ops.Approx.histSketch(
        lens.toSeq.toDF("n_chars"), col("n_chars"), 0L, 640L, 64)
      val served = graft.ops.Approx.histQuantiles(
          state, Seq(990000L), 0L, 640L, 64).head()
      val sorted = lens.sorted
      val exactP99 = sorted(math.max(0,
        math.ceil(0.99 * lens.length).toInt - 1))
      state.exceptAll(whole).isEmpty && whole.exceptAll(state).isEmpty &&
        exactP99 >= served.getLong(4) && exactP99 <= served.getLong(5)
    }

    check("continuous link graph equals the batch rollup; cross-batch re-links merge exactly") {
      // the crawl-prioritization table folded as pages arrive: state
      // keys (source, domain, page) so distinct-page counts merge
      // EXACTLY across batches — pages re-linking a domain later grow
      // n_links but not n_pages
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_links")
        .toFile.getAbsolutePath
      val pages = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"),
          concat(lit("<html><body><a href=\"https://site"),
            pmod(col("doc_id"), lit(23)), lit(".com/p/"), col("doc_id"),
            lit("\">x</a><a href=\"http://site"), pmod(col("doc_id"), lit(7)),
            lit(".com:80/q\">y</a></body></html>")).as("html"))
        .as[(Long, String, String)].collect()
      val (p1, p2) = pages.splitAt(pages.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      val q = graft.streaming.StreamingLinks.startAt(
        input.toDF().toDF("doc_id", "source", "html"),
        s"$root/state", s"$root/ckpt")
      try {
        input.addData(p1.toIndexedSeq); q.processAllAvailable()
        input.addData(p2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val served = graft.streaming.StreamingLinks.linkGraph(
        spark.read.parquet(s"$root/state"))
      val whole = graft.streaming.StreamingLinks.linkGraph(
        graft.streaming.StreamingLinks.linkState(
          graft.streaming.StreamingLinks.harvest(
            pages.toSeq.toDF("doc_id", "source", "html"))))
      served.exceptAll(whole).isEmpty && whole.exceptAll(served).isEmpty
    }

    check("continuous frontier equals the batch build; a late earlier sighting takes the slot") {
      // the t55 scheduler folded as decided harvest rows arrive:
      // first-sighting state merges by MIN, so ordering across
      // batches cannot change the served frontier
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_frontier")
        .toFile.getAbsolutePath
      val decided = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), lit(0L).as("pos"),
          concat(lit("https://site"), pmod(col("doc_id"), lit(23)),
            lit(".com/p/"), pmod(col("doc_id"), lit(50))).as("url_canon"),
          concat(lit("site"), pmod(col("doc_id"), lit(23)), lit(".com"))
            .as("domain"),
          (pmod(col("doc_id"), lit(9)) =!= 0).as("allowed"))
        .as[(Long, Long, String, String, Boolean)].collect()
      // reverse the second half so EARLIER sightings of shared URLs
      // arrive in the LATER batch — the min-merge must still win
      val (f1, f2) = decided.splitAt(decided.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, String, Boolean)]
      val q = graft.streaming.StreamingFrontier.startAt(
        input.toDF().toDF("doc_id", "pos", "url_canon", "domain", "allowed"),
        s"$root/state", s"$root/ckpt")
      try {
        input.addData(f2.reverse.toIndexedSeq); q.processAllAvailable()
        input.addData(f1.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val ranks = graft.queries.Pipeline.domainRanks(
        graft.Tables.documents(spark, sf))
      val served = graft.streaming.StreamingFrontier.frontier(
        spark.read.parquet(s"$root/state"), ranks)
      val whole = graft.streaming.StreamingFrontier.frontier(
        graft.streaming.StreamingFrontier.sightingState(
          decided.toSeq.toDF("doc_id", "pos", "url_canon", "domain",
            "allowed")), ranks)
      served.exceptAll(whole).isEmpty && whole.exceptAll(served).isEmpty &&
        served.count() > 0
    }

    check("continuous domain ranks equal the batch warm replay after two crawl batches") {
      // the authority leg of the streaming crawl stack: edges fold,
      // the rank artifact warm-updates one round per batch — served
      // ranks must equal the batch replay (build on rollup-1, warm on
      // the merged rollup) EXACTLY
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_rank")
        .toFile.getAbsolutePath
      val pages = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"),
          concat(lit("<html><body><a href=\"https://site"),
            pmod(col("doc_id"), lit(23)), lit(".com/p/"), col("doc_id"),
            lit("\">x</a></body></html>")).as("html"))
        .as[(Long, String, String)].collect()
      val (p1, p2) = pages.splitAt(pages.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      val q = graft.streaming.StreamingRank.startAt(
        input.toDF().toDF("doc_id", "source", "html"),
        s"$root/edges", s"$root/ranks", s"$root/ckpt")
      try {
        input.addData(p1.toIndexedSeq); q.processAllAvailable()
        input.addData(p2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      def rollup(ps: Seq[(Long, String, String)]) =
        graft.streaming.StreamingRank.domainEdges(
          graft.streaming.StreamingLinks.linkState(
            graft.streaming.StreamingLinks.harvest(
              ps.toSeq.toDF("doc_id", "source", "html"))))
      def nodesOf(e: org.apache.spark.sql.DataFrame) =
        e.select(col("src").as("id"))
          .unionByName(e.select(col("dst").as("id"))).distinct()
      val e1 = rollup(p1.toSeq); val eAll = rollup(pages.toSeq)
      val replay = graft.ops.Graph.pageRankWeightedFrom(nodesOf(eAll), eAll,
        graft.ops.Graph.pageRankWeighted(nodesOf(e1), e1, iters = 1),
        iters = 1)
      val served = graft.ops.RankIndex.ranksAt(spark, s"$root/ranks")
      served.exceptAll(replay).isEmpty && replay.exceptAll(served).isEmpty &&
        served.count() > 0
    }

    check("continuous spike detector state equals the batch hourly counts; report fires") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("streamtour_spike")
        .toFile.getAbsolutePath
      val ev = graft.Tables.events(spark, sf)
        .select(col("event_type"),
          graft.functions.Cols.nanosToTs(col("ts")).as("ts"))
        .as[(String, java.sql.Timestamp)].collect()
      val (h1, h2) = ev.splitAt(ev.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, java.sql.Timestamp)]
      val q = graft.streaming.StreamingSpike.startAt(
        input.toDF().toDF("event_type", "ts"), s"$root/state", s"$root/ckpt")
      try {
        input.addData(h1.toIndexedSeq); q.processAllAvailable()
        input.addData(h2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val st = spark.read.parquet(s"$root/state")
      val report = graft.streaming.StreamingSpike.spikeReport(st)
      st.agg(sum("cnt")).head().getLong(0) == ev.length &&
        report.count() > 0
    }

    println(if (failed == 0) "StreamTour: all checks passed"
            else s"StreamTour: $failed check(s) FAILED")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}

