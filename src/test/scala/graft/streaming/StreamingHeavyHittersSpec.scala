package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.TextOps

class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streamed summary == exact counts of everything ingested, at saturating capacity") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_hh_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf).cache()
    val toks = docs
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
    val half1 = toks.filter(col("doc_id") % 2 === 0).select("token").as[String].collect()
    val half2 = toks.filter(col("doc_id") % 2 =!= 0).select("token").as[String].collect()

    val input = MemoryStream[String]
    val q = StreamingHeavyHitters.startAt(input.toDF().toDF("token"), "token",
      s"$root/state", s"$root/ckpt", capacity = 1024)
    try {
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      // mid-stream: the summary already covers batch 1 exactly
      val mid = spark.read.parquet(s"$root/state")
      assert(mid.agg(sum("est")).head.getLong(0) == half1.length)
      input.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val state = spark.read.parquet(s"$root/state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // no eviction at this capacity: every error 0, counts exact
    assert(state.forall(_._3 == 0L), "eviction fired below vocab size")
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state.map(t => t._1 -> t._2).toMap == exact,
      "cross-batch merged summary != exact counts of the full stream")
    docs.unpersist()
  }
}
