package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[StreamingFrontier]] — the t55 scheduler composition as a
  * continuously folded artifact. The t55 gate proves the batch
  * composition cross-engine; these specs pin the STREAMING contract:
  * the frontier served off folded state equals the batch build over
  * everything ingested — including the cross-batch first-sighting
  * override (an EARLIER sighting arriving in a later batch must take
  * the slot) — disallowed rows never enter state, and the budget cut
  * runs per domain off the ranks frame.
  */
class StreamingFrontierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streamed frontier == batch build; late earlier sighting wins; disallowed dropped; budget holds") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_frontier_stream")
      .toFile.getAbsolutePath

    // (doc_id, pos, url_canon, domain, allowed)
    val batch1 = Seq(
      (5L, 0L, "https://a.com/1", "a.com", true),
      (5L, 1L, "https://a.com/2", "a.com", true),
      (6L, 0L, "https://a.com/3", "a.com", true),
      (6L, 1L, "https://a.com/4", "a.com", true), // 4th a.com URL — cut at k=3
      (5L, 2L, "https://b.org/1", "b.org", true),
      (5L, 3L, "https://b.org/blocked", "b.org", false))
    val batch2 = Seq(
      // EARLIER sighting of a URL batch 1 already saw at (5,0)
      (2L, 7L, "https://a.com/1", "a.com", true),
      // later re-sighting must NOT displace (5,2)
      (9L, 0L, "https://b.org/1", "b.org", true),
      (3L, 0L, "https://c.net/1", "c.net", true))
    val ranks = Seq(("a.com", 900000L), ("b.org", 500000L))
      .toDF("domain", "rank") // c.net absent → rank 0

    val input = MemoryStream[(Long, Long, String, String, Boolean)]
    val q = StreamingFrontier.startAt(
      input.toDF().toDF("doc_id", "pos", "url_canon", "domain", "allowed"),
      s"$root/state", s"$root/ckpt")
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val state = spark.read.parquet(s"$root/state")
    val served = StreamingFrontier.frontier(state, ranks, k = 3)
      .collect().map(r => r.getAs[String]("url_canon") ->
        ((r.getAs[String]("domain"), r.getAs[Long]("domain_rank"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))).toMap

    // batch twin over everything ingested
    val whole = StreamingFrontier.frontier(StreamingFrontier.sightingState(
      (batch1 ++ batch2).toDF("doc_id", "pos", "url_canon", "domain",
        "allowed")), ranks, k = 3)
      .collect().map(r => r.getAs[String]("url_canon") ->
        ((r.getAs[String]("domain"), r.getAs[Long]("domain_rank"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))).toMap
    assert(served == whole, s"streamed $served != batch $whole")

    // the late-arriving EARLIER sighting took the slot
    assert(served("https://a.com/1") == (("a.com", 900000L, 2L, 7L)), served)
    // the later re-sighting did not displace the original
    assert(served("https://b.org/1") == (("b.org", 500000L, 5L, 2L)), served)
    // per-domain budget: a.com has 4 allowed URLs, only 3 serve, and
    // the cut keeps the 3 EARLIEST sightings (a.com/4 at (6,1) drops)
    assert(served.count(_._2._1 == "a.com") == 3 &&
      !served.contains("https://a.com/4"), served)
    // disallowed never entered state
    assert(!served.contains("https://b.org/blocked") &&
      state.filter(col("url_canon") === "https://b.org/blocked").count() == 0)
    // unranked domain serves at rank 0
    assert(served("https://c.net/1") == (("c.net", 0L, 3L, 0L)), served)
  }
}
