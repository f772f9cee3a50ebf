package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.Dedup

/** Streaming incremental dedup against a persisted minhash index: the
  * online half of the round-6 index artifact. Pins (1) the stateless
  * candidate join finds every banded candidate the batch path finds,
  * (2) the foreachBatch composition's verified output over several
  * micro-batches equals running the batch operator per batch — one code
  * path, two execution modes.
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stateless candidate stream covers the batch candidate set; append mode, no state") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val idx = Dedup.minhashIndex(corpus, n = 3, k = 32, bands = 16).cache()
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(
        input.toDF().toDF("doc_id", "text"), idx, n = 3, k = 32, bands = 16)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_cand_out").start()
    try {
      input.addData(newDocs.toIndexedSeq)
      q.processAllAvailable()
      // stateless: a stream-static join keeps no state store entries
      assert(q.lastProgress.stateOperators.isEmpty,
        s"candidate join should be stateless: ${q.lastProgress.stateOperators}")
      val streamed = pairSet(spark.table("dedup_cand_out"))
      // the verified batch pairs are a subset of banded candidates by
      // construction — every true near-dup must surface in the stream
      val verified = pairSet(Dedup.minhashDedupNewPairs(
        spark.createDataFrame(newDocs.toIndexedSeq).toDF("doc_id", "text"), corpus,
        n = 3, k = 32, bands = 16, minJaccard = 0.5))
      val corpusVerified = verified.filter(p => p._2 % 10 != 0) // stream sees corpus only
      assert(corpusVerified.nonEmpty, "fixture produced no corpus-touching pairs")
      assert(corpusVerified.subsetOf(streamed),
        s"candidates missing true pairs: ${(corpusVerified -- streamed).take(5)}")
    } finally { q.stop(); idx.unpersist(); () }
  }

  test("streaming ANN against the persisted LSH index == batch lshTopK; candidates stateless") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_ann").toFile.getAbsolutePath
    val emb = Tables.embeddings(spark, sf)
    graft.ext.Similarity.writeLshIndex(emb, s"$root/idx", dim = 64,
      bitsPerTable = 6, tables = 8, seedBase = 1000L)
    val idx = graft.ext.Similarity.readLshIndex(spark, s"$root/idx")
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    // stateless candidate surface
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingSimilarity.candidates(
        input.toDF().toDF("vec_id", "embedding"), idx,
        dim = 64, bitsPerTable = 6, tables = 8, seedBase = 1000L)
      .writeStream.outputMode("append").format("memory").queryName("ann_cand_out").start()
    try {
      input.addData(queries.toIndexedSeq)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty, "candidate join should be stateless")
      assert(spark.table("ann_cand_out").count() > 0)
    } finally q.stop()
    // foreachBatch served top-k == batch lshTopK with the same index
    val input2 = MemoryStream[(Long, Array[Float])]
    val served = StreamingSimilarity.start(input2.toDF().toDF("vec_id", "embedding"),
      emb, idx, k = 5, dim = 64, s"$root/out", s"$root/ckpt",
      bitsPerTable = 6, tables = 8)
    try {
      input2.addData(queries.toIndexedSeq)
      served.processAllAvailable()
    } finally served.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val streamed = rows(spark.read.parquet(s"$root/out")
      .select("query_id", "neighbor_id", "sim", "rank"))
    val batch = rows(graft.ext.Similarity.lshTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, dim = 64,
        bitsPerTable = 6, tables = 8, corpusIndex = Some(idx))
      .select("query_id", "neighbor_id", "sim", "rank"))
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
  }

  test("streaming ANN serving carries the batch recall guarantee: recall@5 == 1.0 at s02 params") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_recall").toFile.getAbsolutePath
    val emb = Tables.embeddings(spark, sf)
    // the s02 gate's recall-saturating parameters (2 bits -> 4 buckets,
    // 32 tables): a true neighbor pair must split across both planes in
    // ALL 32 tables to be missed — recall is exactly 1.0, so the
    // SERVING path (per-batch index re-read included) must reproduce
    // the exact top-k, not just some top-k
    graft.ext.Similarity.writeLshIndex(emb, s"$root/idx", dim = 64,
      bitsPerTable = 2, tables = 32, seedBase = 1000L)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val input = MemoryStream[(Long, Array[Float])]
    val served = StreamingSimilarity.startAt(input.toDF().toDF("vec_id", "embedding"),
      s"$root/idx", k = 5, s"$root/out", s"$root/ckpt")
    try {
      input.addData(queries.toIndexedSeq)
      served.processAllAvailable()
    } finally served.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairs(spark.read.parquet(s"$root/out"))
    val exact = pairs(graft.ext.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 20), emb, k = 5))
    assert(exact.size == 100)
    val recall = (exact intersect streamed).size.toDouble / exact.size
    assert(recall == 1.0,
      s"streaming recall@5 $recall < 1.0; missed=${(exact -- streamed).take(5)}")
  }

  test("foreachBatch verified stream over two micro-batches == batch operator per batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_dedup").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    Dedup.writeMinhashIndex(corpus, s"$root/idx", n = 3, k = 32, bands = 16)
    val idx = Dedup.readMinhashIndex(spark, s"$root/idx")
    val batch1 = docs.filter(col("doc_id") % 20 === 0)
    val batch2 = docs.filter(col("doc_id") % 20 === 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.select("doc_id", "text")
      .as[(Long, String)].collect().toIndexedSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(input.toDF().toDF("doc_id", "text"),
      corpus, idx, s"$root/out", s"$root/ckpt",
      n = 3, k = 32, bands = 16, minJaccard = 0.5)
    try {
      input.addData(rows(batch1))
      q.processAllAvailable()
      input.addData(rows(batch2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = pairSet(spark.read.parquet(s"$root/out"))
    val expected =
      pairSet(Dedup.minhashDedupNewPairs(batch1, corpus,
        n = 3, k = 32, bands = 16, minJaccard = 0.5)) ++
      pairSet(Dedup.minhashDedupNewPairs(batch2, corpus,
        n = 3, k = 32, bands = 16, minJaccard = 0.5))
    assert(expected.nonEmpty, "fixture produced no pairs")
    assert(streamed == expected,
      s"only-stream=${(streamed -- expected).take(5)} only-batch=${(expected -- streamed).take(5)}")
  }
}
