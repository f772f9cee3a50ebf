package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.{Dedup, Multimodal, Similarity, TextOps}

/** End-to-end tour of the training-data pipeline operators through the
  * public API on the real fixtures: analyze → filter → dedup (exact +
  * near) → similarity — the shape of an actual corpus-cleaning job.
  * Run: `sbt "runMain graft.examples.PipelineTour"`.
  */
object PipelineTour {
  def main(args: Array[String]): Unit = {
    implicit val spark = GraftSession.local(8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    var failed = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch { case e: Throwable => println(s"  ! $name: $e"); false }
      println(f"${if (ok) "OK  " else "FAIL"} $name"); if (!ok) failed += 1
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

    val analyzed = TextOps.analyze(docs).cache()
    check("text analysis covers every doc") { analyzed.count() == docs.count() }

    val quality = analyzed.filter(col("quality") > 0.2)
    check("quality filter keeps a nonempty subset") {
      val n = quality.count(); n > 0 && n <= docs.count()
    }

    val deduped = Dedup.dropExactDuplicates(docs)
    check("exact dedup keeps distinct texts") {
      deduped.count() == docs.select("text").distinct().count()
    }

    val nearPairs = Dedup.minhashDedupPairs(docs, n = 3, k = 32, bands = 16, minJaccard = 0.5)
    check("minhash near-dup pairs found and verified >= threshold") {
      val rows = nearPairs.collect()
      rows.nonEmpty && rows.forall(_.getDouble(2) >= 0.5)
    }

    check("ANN top-5 agrees with brute force on top-1 for most queries") {
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(q, emb, 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ivf = Similarity.ivfTopK(q, emb, 5, nCentroids = 16, nProbe = 8)
        .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
      val hits = exact.count { case (qid, n1) => ivf.getOrElse(qid, Set.empty).contains(n1) }
      hits >= exact.size / 2
    }

    check("multimodal features flow into dedup") {
      val media = Multimodal.syntheticMedia(docs.limit(100))
      Multimodal.extractFeatures(media).count() == 100
    }

    check("fingerprint is a pure function of the text and non-degenerate") {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val fps = docs.select(lower(col("text")).as("lt"),
        graft.functions.GraftFunctions.graftFingerprint(lower(col("text")), 3).as("fp"))
      // every text maps to exactly one fingerprint (so exact dups always
      // cluster), and the fingerprints don't collapse to a few values
      // (the fixture's 500 texts produce ~388 — near-dups sharing their
      // rarest shingle DO collide, which is the winnowing point)
      fps.groupBy("lt").agg(countDistinct("fp").as("nfp"))
        .agg(max("nfp")).head().getLong(0) == 1L &&
        fps.select("fp").distinct().count() > 100
    }

    check("LSH embedding dedup finds the planted twins and nothing else at 0.95") {
      val twins = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.05f)).otherwise(x))
          .as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionByName(twins)
      val pairs = Similarity.cosineDupPairsLsh(corpus, minSim = 0.95, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs.nonEmpty && pairs.forall { case (a, b) => b == a + 100000L }
    }

    check("stratified sample is exact and reproducible") {
      val s1 = graft.ops.Sampling.perKeyExact(docs, Seq("lang"), Seq("doc_id"), k = 5)
      val s2 = graft.ops.Sampling.perKeyExact(docs, Seq("lang"), Seq("doc_id"), k = 5)
      s1.collect().map(_.toSeq).toSet == s2.collect().map(_.toSeq).toSet &&
        s1.groupBy("lang").count().collect().forall(_.getLong(1) <= 5)
    }

    check("incremental ingest dedup: batch-vs-corpus only, both text and embedding") {
      val newDocs = docs.filter(col("doc_id") % 7 === 0)
      val docCorpus = docs.filter(col("doc_id") % 7 =!= 0)
      val textPairs = Dedup.minhashDedupNewPairs(newDocs, docCorpus,
        n = 3, k = 32, bands = 16, minJaccard = 0.5).collect()
      val newVecs = emb.filter(col("vec_id") % 7 === 0)
      val vecPairs = Similarity.cosineDupPairsNew(newVecs,
        emb.filter(col("vec_id") % 7 =!= 0), minSim = 0.35).collect()
      val newDocIds = newDocs.select("doc_id").collect().map(_.getLong(0)).toSet
      val newVecIds = newVecs.select("vec_id").collect().map(_.getLong(0)).toSet
      // every pair touches the batch on the left — never corpus-vs-corpus;
      // both paths must actually find pairs (forall alone passes vacuously)
      textPairs.nonEmpty && textPairs.forall(r => newDocIds(r.getLong(0))) &&
        vecPairs.nonEmpty && vecPairs.forall(r => newVecIds(r.getLong(0)))
    }

    check("persisted minhash index: build once, probe every batch") {
      // production ingest shape: the corpus signature index is built and
      // written ONCE (the expensive part — it scales with the corpus),
      // then every incoming batch probes the reloaded index instead of
      // re-signaturing the corpus
      val idxDir = java.nio.file.Files.createTempDirectory("tour_mh_idx")
        .toFile.getAbsolutePath
      val newDocs = docs.filter(col("doc_id") % 7 === 0)
      val docCorpus = docs.filter(col("doc_id") % 7 =!= 0)
      Dedup.writeMinhashIndex(docCorpus, s"$idxDir/idx", n = 3, k = 32, bands = 16)
      val idx = Dedup.readMinhashIndex(spark, s"$idxDir/idx")
      val indexed = Dedup.minhashDedupNewPairs(newDocs, docCorpus,
          n = 3, k = 32, bands = 16, minJaccard = 0.5, corpusIndex = Some(idx))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val direct = Dedup.minhashDedupNewPairs(newDocs, docCorpus,
          n = 3, k = 32, bands = 16, minJaccard = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      indexed.nonEmpty && indexed == direct
    }

    check("near-dup pairs -> clusters -> keep one representative per group") {
      val pairs = Dedup.minhashDedupPairs(docs, n = 3, k = 32, bands = 16, minJaccard = 0.5)
      val groups = Dedup.clusters(pairs).collect().map(r => (r.getLong(0), r.getLong(1)))
      val kept = Dedup.dropNearDuplicates(docs, pairs).count()
      // every cluster keeps exactly its min-id member; singletons untouched
      groups.nonEmpty &&
        kept == docs.count() - groups.count { case (id, c) => id != c }
    }

    check("reproducible corpus curation: split + quality + OOV filters compose") {
      val splits = graft.ops.Sampling.hashSplit(docs, Seq("doc_id"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      val oov = TextOps.oovRate(docs, topK = 10)
      val curated = splits.filter(col("split") === "train")
        .join(oov.filter(col("oov_rate") < 0.9), Seq("doc_id"))
      // deterministic end-to-end: the same curation re-derives exactly
      val again = graft.ops.Sampling.hashSplit(docs, Seq("doc_id"),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .filter(col("split") === "train")
        .join(TextOps.oovRate(docs, topK = 10).filter(col("oov_rate") < 0.9), Seq("doc_id"))
      val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
      ids.nonEmpty && ids == again.select("doc_id").collect().map(_.getLong(0)).toSet
    }

    check("weighted sample is deterministic and favors heavy docs") {
      val weighted = docs.withColumn("w", length(col("text")).cast("double"))
      val s1 = graft.ops.Sampling.weightedPriority(weighted, "w", Seq("doc_id"), m = 50)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val s2 = graft.ops.Sampling.weightedPriority(weighted, "w", Seq("doc_id"), m = 50)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      s1 == s2 && s1.size == 50
    }

    check("BPE-ish token count is >= whitespace token count on every real doc") {
      // restrict to docs with a non-whitespace char: tokenCount counts
      // split()'s empty fragments on tab/newline-only text, so the
      // invariant only holds where there are real tokens
      docs.filter(col("text").rlike("\\S"))
        .select(TextOps.tokenCount(col("text")).as("ws"),
          TextOps.bpeTokenCount(col("text")).as("bpe"))
        .filter(col("bpe") < col("ws")).count() == 0
    }

    check("z-order layout sharpens per-file pruning on a second column") {
      val table = spark.range(0, 20000)
        .select((col("id") % 200).as("a"), (col("id") / 200).cast("long").as("b"))
      val zed = graft.ops.ZOrder.layoutBy(table, Seq("a", "b"), numPartitions = 8)
      val linear = table.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      graft.ops.ZOrder.partitionSpanFraction(zed, "b") <
        graft.ops.ZOrder.partitionSpanFraction(linear, "b")
    }

    spark.stop()
    if (failed > 0) { println(s"$failed FAILED"); sys.exit(1) }
    println("PipelineTour: all checks passed")
  }
}
