package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.TextOps
import graft.ops.Approx

class StreamingCmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streamed sketch == batch sketch of everything ingested, cell for cell") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_cms_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf).cache()
    val toks = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val half1 = toks.filter(col("doc_id") % 2 === 0).select("token").as[String].collect()
    val half2 = toks.filter(col("doc_id") % 2 =!= 0).select("token").as[String].collect()

    val input = MemoryStream[String]
    val q = StreamingCms.startAt(input.toDF().toDF("token"), "token",
      s"$root/state", s"$root/ckpt", depth = 4, width = 256)
    try {
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      // mid-stream: total mass is depth × batch-1 items
      val mid = spark.read.parquet(s"$root/state")
      assert(mid.agg(sum("cnt")).head().getLong(0) == 4L * half1.length)
      input.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // streaming introduces NO approximation: the folded state equals
    // the batch-built sketch of the whole stream, cell for cell
    val state = spark.read.parquet(s"$root/state")
    val whole = Approx.cmsSketch(toks.select("token"), "token",
      depth = 4, width = 256)
    assert(state.exceptAll(whole).isEmpty && whole.exceptAll(state).isEmpty,
      "streamed sketch != batch sketch of the full stream")
    // and estimates served off the stored state keep the one-sided
    // guarantee for keys chosen after the fact
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Approx.cmsEstimate(state, toks.select("token").distinct(),
        "token", depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: served estimate underestimates (${est(t)} < $c)")
    }
    docs.unpersist()
  }
}
