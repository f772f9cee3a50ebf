package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[StreamingRank]] — authority that tracks the crawl. Pins the
  * determinism contract: after two batches the served vector equals
  * the hand replay (build on batch-1's rollup, warm-update on the
  * merged rollup), the sidecar accumulates iteration provenance, and
  * a domain first linked in batch 2 enters at the warm prior.
  */
class StreamingRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def page(id: Long, source: String, hrefs: String*): (Long, String, String) =
    (id, source,
      "<html><body>" + hrefs.map(h => s"""<a href="$h">x</a>""").mkString +
        "</body></html>")

  test("streamed ranks == batch warm replay; provenance accumulates; new domain enters warm") {
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_rank_stream")
      .toFile.getAbsolutePath

    val batch1 = Seq(
      page(1L, "s1", "https://a.com/x", "https://a.com/y"),
      page(2L, "s1", "https://b.org/1"),
      page(3L, "s2", "https://a.com/z"))
    val batch2 = Seq(
      // c.net is first linked here — it must enter at the warm prior
      page(4L, "s2", "https://c.net/only"),
      page(1L, "s1", "https://a.com/again"))

    val input = MemoryStream[(Long, String, String)]
    val q = StreamingRank.startAt(
      input.toDF().toDF("doc_id", "source", "html"),
      s"$root/edges", s"$root/ranks", s"$root/ckpt")
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val served = graft.ops.RankIndex.ranksAt(spark, s"$root/ranks")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("rank"))
      .toMap

    // hand replay: build on rollup(B1), one warm round on rollup(B1+B2)
    def rollup(pages: Seq[(Long, String, String)]) = {
      val st = StreamingLinks.linkState(StreamingLinks.harvest(
        pages.toDF("doc_id", "source", "html")))
      StreamingRank.domainEdges(st)
    }
    def nodesOf(e: org.apache.spark.sql.DataFrame) =
      e.select(org.apache.spark.sql.functions.col("src").as("id"))
        .unionByName(e.select(org.apache.spark.sql.functions.col("dst").as("id")))
        .distinct()
    val e1 = rollup(batch1)
    val eAll = rollup(batch1 ++ batch2)
    val replay = graft.ops.Graph.pageRankWeightedFrom(nodesOf(eAll), eAll,
        graft.ops.Graph.pageRankWeighted(nodesOf(e1), e1, iters = 1),
        iters = 1)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("rank"))
      .toMap
    assert(served == replay, s"served $served != replay $replay")
    // both batches' rounds recorded
    assert(graft.ops.RankIndex.readRankParams(spark, s"$root/ranks")
      .contains(graft.ops.RankIndex.RankParams(2)))
    // the late domain is present and received mass through its in-edge
    assert(served.contains("c.net") && served("c.net") >= 150000L, served)
  }
}
