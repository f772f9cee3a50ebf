package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ops.Approx

class StreamingHistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streamed histogram == batch sketch of everything ingested; served quantiles bracket the exact") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_hist_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf).cache()
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("n_chars")).as[Long].collect()
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("n_chars")).as[Long].collect()

    val input = MemoryStream[Long]
    val q = StreamingHist.startAt(input.toDF().toDF("n_chars"), "n_chars",
      s"$root/state", s"$root/ckpt", lo = 0L, hi = 640L, buckets = 64)
    try {
      input.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      // mid-stream: total mass equals the rows ingested so far
      val mid = spark.read.parquet(s"$root/state")
      assert(mid.agg(sum("cnt")).head().getLong(0) == half1.length.toLong)
      input.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // streaming introduces NO approximation: the folded state equals
    // the batch-built sketch of the whole stream, cell for cell
    val state = spark.read.parquet(s"$root/state")
    val whole = Approx.histSketch(docs, col("n_chars"), 0L, 640L, 64)
    assert(state.exceptAll(whole).isEmpty && whole.exceptAll(state).isEmpty,
      "streamed sketch != batch sketch of the full stream")
    // quantile brackets served off the stored state keep the
    // one-bin-width guarantee for fractions chosen after the fact
    val qs = Approx.histQuantiles(state, Seq(500000L, 990000L), 0L, 640L, 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    Seq(500000L, 990000L).foreach { f =>
      val exact = docs.agg(
        expr(s"CAST(percentile(n_chars, ${f / 1e6}, 1) AS BIGINT)")).head.getLong(0)
      val (qlo, qhi) = qs(f)
      assert(exact >= qlo - 10 && exact <= qhi + 10,
        s"f=$f: exact percentile $exact outside served bracket [$qlo, $qhi]")
    }
    docs.unpersist()
  }
}
