package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.Dedup

class StreamingChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streamed chunk store == batch build of everything ingested; mid-stream supersede; serving matches from-scratch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_chunk_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf).cache()
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // batch 2 re-ingests a quarter of batch 1's ids with CHANGED text —
    // the stream must supersede their chunk rows, not duplicate them
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect() ++
      docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" shifted tail")))
        .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val q = StreamingChunks.startAt(
      input.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/ckpt")
    try {
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      assert(Dedup.isChunkIndex(spark, s"$root/state"), "bootstrap batch missing")
      input.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val finalCorpus = docs.filter(col("doc_id") % 4 =!= 0)
      .unionByName(docs.filter(col("doc_id") % 4 === 0)
        .withColumn("text", concat(col("text"), lit(" shifted tail"))))
    def sameRows(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(sameRows(Dedup.readChunkIndex(spark, s"$root/state"),
      Dedup.chunkTable(finalCorpus)), "streamed store != batch build")
    // provenance served off the folded state matches from-scratch
    val probe = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("EDIT >> "), col("text")).as("text"))
    assert(sameRows(Dedup.chunkProvenanceIndexed(spark, s"$root/state", probe),
      Dedup.chunkProvenance(probe, finalCorpus)),
      "serving off the streamed store drifted")
    docs.unpersist()
  }
}
