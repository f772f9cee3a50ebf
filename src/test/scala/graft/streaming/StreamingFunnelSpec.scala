package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def ev(user: Long, tSec: Long, id: Long, typ: String) =
    StreamingFunnel.Ev(user, new java.sql.Timestamp(tSec * 1000),
      tSec * 1000000000L, id, typ)

  /** Current answer per user = componentwise extreme of its emissions
    * (minima only decrease, the stage only rises — the operator's
    * Update contract).
    */
  private def currentRows(t: DataFrame) = t
    .groupBy("userId")
    .agg(min("firstView").as("fv"), min("firstClick").as("fc"),
      min("firstPurchase").as("fp"), max("stage").as("st"))
    .collect()
    .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
      Option(r.get(2)).map(_.asInstanceOf[Long]),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))).toMap

  test("hand scenario: strictly-after rule, out-of-order legal arrival, maturation across triggers") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[StreamingFunnel.Ev]
    val evs = input.toDS().withWatermark("ts", "20 seconds")
      .as[StreamingFunnel.Ev]
    val q = StreamingFunnel.funnel(evs)
      .writeStream.outputMode("update").format("memory").queryName("sfun_hand").start()
    try {
      // batch 1: user 1's whole funnel; user 2's click@10 (NO view yet),
      // purchase@22, click@25 — the qualifying view@20 arrives LATER
      input.addData(ev(1, 10, 1, "view"), ev(1, 20, 2, "click"),
        ev(1, 30, 3, "purchase"),
        ev(2, 10, 4, "click"), ev(2, 22, 5, "purchase"), ev(2, 25, 6, "click"))
      q.processAllAvailable()
      // batch 2: user 2's view@20 — behind already-delivered events but
      // above the watermark (wm = 30-20 = 10s), fully legal: buffering
      // must slot it into fold order
      input.addData(ev(2, 20, 7, "view"))
      q.processAllAvailable()
      // batch 3: advance the watermark far past everything
      input.addData(ev(99, 200, 8, "noop"))
      StreamingAsOf.drainToFixpoint(q, () => spark.table("sfun_hand").count())
      val got = currentRows(spark.table("sfun_hand")) - 99L
      val s = 1000000000L
      // user 1: full funnel. user 2: click@10 never qualifies (no view
      // before it), purchase@22 never qualifies (no qualified click
      // before it), view@20 then click@25 → stage 2
      assert(got == Map(
        1L -> ((Some(10 * s), Some(20 * s), Some(30 * s), 3L)),
        2L -> ((Some(20 * s), Some(25 * s), None, 2L))), got)
    } finally q.stop()
  }

  test("stream == batch e11 on the events fixture across a random interleaved split") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => StreamingFunnel.Ev(r.getLong(0),
        new java.sql.Timestamp(r.getLong(1) / 1000000L), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val (h1, h2) = all.partition(_.eventId % 2 == 0) // time-interleaved halves
    val maxSec = all.map(_.tsNanos).max / 1000000000L
    val input = MemoryStream[StreamingFunnel.Ev]
    // a 30-day delay keeps the random interleave fully legal: nothing
    // matures until the advance event, then everything folds in order
    val evs = input.toDS().withWatermark("ts", "30 days")
      .as[StreamingFunnel.Ev]
    val q = StreamingFunnel.funnel(evs)
      .writeStream.outputMode("update").format("memory").queryName("sfun_fix").start()
    try {
      input.addData(h1.toIndexedSeq); q.processAllAvailable()
      input.addData(h2.toIndexedSeq); q.processAllAvailable()
      input.addData(ev(999999L, maxSec + 62L * 86400, 0L, "noop"))
      StreamingAsOf.drainToFixpoint(q, () => spark.table("sfun_fix").count())
      val got = currentRows(spark.table("sfun_fix")) - 999999L
      val batch = graft.queries.Pipeline.all("e11_funnel")(spark, sf).collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))).toMap
      assert(got.size == batch.size, s"${got.size} users != ${batch.size}")
      batch.foreach { case (u, want) =>
        assert(got.get(u).contains(want), s"user $u: got ${got.get(u)}, want $want")
      }
    } finally q.stop()
  }
}
