package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.TextOps

class StreamingTextIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streamed index == batch index of everything ingested; mid-stream supersede lands; serving matches from-scratch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_text_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf).cache()
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // the second batch re-ingests a quarter of batch 1's ids with
    // CHANGED text — the stream must supersede, not duplicate
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect() ++
      docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" spark spark")))
        .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = StreamingTextIndex.startAt(
      input.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")
    try {
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      assert(TextOps.isTextIndex(spark, s"$root/state"), "bootstrap batch missing")
      input.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // the folded artifact equals the batch-built index of the final
    // corpus (changed ids superseded), postings and stats both
    val finalCorpus = docs.filter(col("doc_id") % 4 =!= 0)
      .unionByName(docs.filter(col("doc_id") % 4 === 0)
        .withColumn("text", concat(col("text"), lit(" spark spark"))))
    TextOps.writeTextIndex(finalCorpus, s"$root/ref")
    def sameRows(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(sameRows(spark.read.parquet(s"$root/state/postings"),
      spark.read.parquet(s"$root/ref/postings")),
      "streamed postings != batch build")
    assert(sameRows(spark.read.parquet(s"$root/state/stats"),
      spark.read.parquet(s"$root/ref/stats")), "streamed stats != batch build")
    // and retrieval served off the folded state matches from-scratch
    val terms = Seq("dup", "spark", "vector", "merge")
    assert(sameRows(TextOps.bm25ServeIndexed(spark, s"$root/state", terms, k = 20),
      TextOps.bm25TopK(finalCorpus, terms, k = 20)),
      "serving off the streamed index drifted")
    docs.unpersist()
  }

  test("streamed tfidf index == batch build; supersede ripples df/idf/norms; serving matches from-scratch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_tfidf_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf).cache()
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect() ++
      docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" spark spark")))
        .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = StreamingTextIndex.startAtTfidf(
      input.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")
    try {
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      assert(TextOps.isTfidfIndex(spark, s"$root/state"), "bootstrap batch missing")
      input.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // the folded artifact equals the batch build of the final corpus —
    // including every doc's norm², which the batch-2 supersede must
    // have rippled through df/idf across the WHOLE corpus
    val finalCorpus = docs.filter(col("doc_id") % 4 =!= 0)
      .unionByName(docs.filter(col("doc_id") % 4 === 0)
        .withColumn("text", concat(col("text"), lit(" spark spark"))))
    TextOps.writeTfidfIndex(finalCorpus, s"$root/ref")
    def sameRows(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(sameRows(spark.read.parquet(s"$root/state/postings"),
      spark.read.parquet(s"$root/ref/postings")),
      "streamed tfidf postings != batch build")
    assert(sameRows(spark.read.parquet(s"$root/state/stats"),
      spark.read.parquet(s"$root/ref/stats")),
      "streamed tfidf stats != batch build")
    val terms = Seq("dup", "spark", "vector", "merge")
    assert(sameRows(
      TextOps.tfidfCosineTopKAt(spark, s"$root/state", terms, k = 20),
      TextOps.tfidfCosineTopK(finalCorpus, terms, k = 20)),
      "serving off the streamed tfidf index drifted")
    docs.unpersist()
  }
}
