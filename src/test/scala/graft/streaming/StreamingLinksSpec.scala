package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[StreamingLinks]] — the t51 crawl-prioritization rollup as a
  * continuously folded artifact. The t51 gate proves the batch rollup
  * cross-engine; these specs pin the STREAMING contract: the folded
  * state served through [[StreamingLinks.linkGraph]] equals the
  * batch-built rollup of everything ingested — exactly, including
  * distinct-page counts across batches (the reason the state keys
  * pages, not counters) — and survives a swap mid-stream.
  */
class StreamingLinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def page(id: Long, source: String, hrefs: String*): (Long, String, String) =
    (id, source,
      "<html><body>" + hrefs.map(h => s"""<a href="$h">x</a>""").mkString +
        "</body></html>")

  test("streamed link graph == batch rollup of all pages; distinct pages merge across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_links_stream").toFile.getAbsolutePath

    // page 1 links a.com twice; page 2 links a.com AND b.org; page 1
    // re-links a.com in batch TWO — n_links must grow to 3 while
    // n_pages for (s1, a.com) stays 2 (the cross-batch distinct case
    // a counter-grain state would get wrong)
    val batch1 = Seq(
      page(1L, "s1", "https://a.com/x", "https://a.com/y?utm_source=f"),
      page(2L, "s1", "https://WWW.A.com:443/z", "http://b.org/1"),
      page(3L, "s2", "https://b.org/2"))
    val batch2 = Seq(
      page(1L, "s1", "https://a.com/again"),
      page(4L, "s2", "https://c.net/only", ""))

    val input = MemoryStream[(Long, String, String)]
    val q = StreamingLinks.startAt(
      input.toDF().toDF("doc_id", "source", "html"),
      s"$root/state", s"$root/ckpt")
    try {
      input.addData(batch1)
      q.processAllAvailable()
      val mid = StreamingLinks.linkGraph(spark.read.parquet(s"$root/state"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(mid == Map(
        ("s1", "a.com") -> ((3L, 2L)),
        ("s1", "b.org") -> ((1L, 1L)),
        ("s2", "b.org") -> ((1L, 1L))), mid)
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val served = StreamingLinks.linkGraph(spark.read.parquet(s"$root/state"))
    val batchWhole = StreamingLinks.linkGraph(StreamingLinks.linkState(
      StreamingLinks.harvest((batch1 ++ batch2)
        .toDF("doc_id", "source", "html"))))
    assert(served.exceptAll(batchWhole).isEmpty &&
      batchWhole.exceptAll(served).isEmpty,
      "streamed rollup != batch rollup of the full page set")
    // the cross-batch re-link: links grew, distinct pages did not
    val a = served.filter(col("source") === "s1" && col("domain") === "a.com")
      .head()
    assert(a.getLong(2) == 4L && a.getLong(3) == 2L, a)
    // the empty href never reaches the state
    assert(served.filter(col("domain") === "").count() == 0)
  }
}
