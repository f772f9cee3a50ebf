package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingSpikeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streamed spike report == batch e10 on everything ingested, across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_spike_stream").toFile.getAbsolutePath
    // (event_type, ts) pairs from the fixture, split into two batches
    // by event id parity — cross-batch merging must still equal the
    // batch aggregation over the union
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        graft.functions.Cols.nanosToTs(col("ts")).as("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingSpike.startAt(
      input.toDF().toDF("event_type", "ts"),
      s"$root/state", s"$root/ckpt")
    try {
      input.addData(ev.filter(_._1 % 2 == 0).map(e => (e._2, e._3)).toIndexedSeq)
      q.processAllAvailable()
      input.addData(ev.filter(_._1 % 2 != 0).map(e => (e._2, e._3)).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = StreamingSpike.spikeReport(spark.read.parquet(s"$root/state"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = graft.queries.Pipeline.e10SpikeDetection(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(want.nonEmpty, "batch e10 must produce rows on the fixture")
    assert(got == want,
      s"stream-state report diverged: only-stream=${(got -- want).take(3)} " +
        s"only-batch=${(want -- got).take(3)}")
  }

  test("retention prunes old hours at merge time; report survives on the retained window") {
    import spark.implicits._
    val mkCounts = (rows: Seq[(String, Long)]) =>
      rows.toDF("event_type", "_h")
        .select(col("event_type"), expr("timestamp_micros(_h * 3600000000)").as("ts"))
    // state holds hours 0..30; a batch at hour 60 with retain=48 must
    // evict hours <= 12 and keep the rest
    val state = StreamingSpike.mergeStep(
      StreamingSpike.batchHourCounts(mkCounts((0L to 30L).map(h => ("click", h)))),
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StreamingSpike.stateSchema),
      retainHours = 48L)
    val next = StreamingSpike.mergeStep(
      StreamingSpike.batchHourCounts(mkCounts(Seq(("click", 60L)))),
      state, retainHours = 48L)
    val hours = next.select("hour").collect().map(_.getLong(0)).sorted
    assert(hours.head == 13L && hours.last == 60L,
      s"retention window wrong: ${hours.head}..${hours.last}")
    assert(hours.length == 19, s"expected hours 13..30 + 60, got ${hours.length}")
  }
}
