package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  lazy val streamDir: String = EventsStream.stageFixture(spark, sf)

  test("streaming tumbling windows equal the batch computation") {
    val q = EventsStream.tumbling(EventsStream.read(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventsStream.tumblingBatch(spark, sf)
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming sliding windows equal the batch explode expansion (e04)") {
    val q = EventsStream.sliding(EventsStream.read(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_out")
        .select(unix_micros(col("window.start")) * 1000, col("event_type"), col("cnt"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.queries.Pipeline.e04Sliding(spark, sf)
        .select(col("win_start"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("session windows produce per-user sessions") {
    val q = EventsStream.sessions(EventsStream.read(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sessions_out")
      assert(out.count() > 0)
      // every event lands in exactly one session
      val totalEvents = out.agg(sum("n_events")).head.getLong(0)
      assert(totalEvents == graft.Tables.events(spark, sf).count())
      // per-user session COUNTS equal the batch gaps-and-islands
      // formulation (q13, same 30-minute gap) — the two constructions
      // must carve identical session boundaries
      val streamed = out.groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.queries.Relational.q13Sessions(spark, sf)
        .select("user_id", "n_sessions")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        s"diff: ${(streamed.toSet -- batch.toSet).take(3)} vs ${(batch.toSet -- streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join") {
    val q = EventsStream.clickToPurchaseJoin(EventsStream.read(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_out")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventsStream.clickToPurchaseBatch(spark, sf)
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops duplicates with bounded state") {
    // stage the fixture TWICE so every event arrives duplicated
    val dir = EventsStream.stageFixture(spark, sf)
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$sf/events.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$dir/events_copy.parquet")
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
      dst.getFileSystem(conf), dst, false, true, conf)
    val q = EventsStream.dedupedStream(EventsStream.read(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val expected = graft.Tables.events(spark, sf).count()
      assert(spark.table("dedup_out").count() == expected)
      assert(spark.table("dedup_out").select("event_id").distinct().count() == expected)
    } finally q.stop()
  }

  test("streaming as-of equals the batch as-of on matured ticks") {
    val src = StreamingAsOf.clickViewTicks(EventsStream.read(spark, streamDir))
    val q = StreamingAsOf.joinBackward(src)
      .writeStream.outputMode("append").format("memory").queryName("sasof_out").start()
    try {
      StreamingAsOf.drainToFixpoint(q, () => spark.table("sasof_out").count())
      val streamed = spark.table("sasof_out").collect()
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val batch = StreamingAsOf.clickViewBatch(spark, sf)
      assert(streamed.nonEmpty)
      streamed.foreach { case (leftId, m) => assert(batch(leftId) == m, s"click $leftId") }
      // every click older than maxTs - watermark delay must have matured
      val ev = graft.Tables.events(spark, sf).withColumn("us", expr("ts div 1000"))
      val horizon = ev.agg(max("us")).head.getLong(0) - 10L * 60 * 1000000
      val expectedMatured = ev.filter(col("event_type") === "click")
        .filter(col("us") <= horizon).count()
      assert(streamed.size >= expectedMatured, s"${streamed.size} < $expectedMatured")
    } finally q.stop()
  }

  // single-key test tick at second granularity, shared by the MemoryStream specs
  private def tick(tSec: Long, left: Boolean, id: Long, v: Double = 0.0) = StreamingAsOf.Tick(
    1L, new java.sql.Timestamp(tSec * 1000), tSec * 1000000L, left, id, v)

  test("streaming as-of keeps rights needed by out-of-order (legal) lefts across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingAsOf.Tick]
    val ticks = input.toDS().withWatermark("ts", "20 seconds").as[StreamingAsOf.Tick]
    val q = StreamingAsOf.joinBackward(ticks)
      .writeStream.outputMode("append").format("memory").queryName("sasof_ooo").start()
    try {
      // batch 1: three rights + a left at t=40 → watermark becomes 20s
      input.addData(tick(10, false, 910), tick(20, false, 920),
        tick(30, false, 930), tick(40, true, 40))
      q.processAllAvailable()
      // batch 2: a left at t=25 — BEHIND the pending left but above the
      // watermark, so fully legal; its match (the right at t=20) must
      // still be buffered
      input.addData(tick(25, true, 25))
      q.processAllAvailable()
      // batch 3: advance the watermark past both lefts
      input.addData(tick(100, true, 100))
      StreamingAsOf.drainToFixpoint(q, () => spark.table("sasof_ooo").count())
      val got = spark.table("sasof_ooo").collect()
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(got.get(25).contains(Some(920L)), s"out-of-order left lost its right: $got")
      assert(got.get(40).contains(Some(930L)), got.toString)
    } finally q.stop()
  }

  test("streaming forward as-of: in-window match final via watermark, out-of-window nulled") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingAsOf.Tick]
    val ticks = input.toDS().withWatermark("ts", "5 seconds").as[StreamingAsOf.Tick]
    val q = StreamingAsOf.joinForward(ticks, toleranceMicros = 10L * 1000000)
      .writeStream.outputMode("append").format("memory").queryName("sasof_fwd").start()
    try {
      // L(10) has only a right at t=30 — outside its 10s window
      input.addData(tick(10, true, 10), tick(30, false, 930))
      q.processAllAvailable()
      // L(28): candidate r30 is in-window but not yet final (wm=25)
      input.addData(tick(28, true, 28), tick(40, false, 940))
      q.processAllAvailable()
      // push the watermark past both maturity points
      input.addData(tick(60, false, 960))
      StreamingAsOf.drainToFixpoint(q, () => spark.table("sasof_fwd").count())
      val got = spark.table("sasof_fwd").collect()
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(got.get(10).contains(None), s"out-of-window left must null-match: $got")
      assert(got.get(28).contains(Some(930L)), s"in-window left must take earliest right: $got")
    } finally q.stop()
  }

  test("forward as-of drops buffered rights for keys whose stream ends on right ticks") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def tickK(key: Long, tSec: Long, left: Boolean, id: Long) = StreamingAsOf.Tick(
      key, new java.sql.Timestamp(tSec * 1000), tSec * 1000000L, left, id, 0.0)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingAsOf.Tick]
    val ticks = input.toDS().withWatermark("ts", "5 seconds").as[StreamingAsOf.Tick]
    val q = StreamingAsOf.joinForward(ticks, toleranceMicros = 10L * 1000000)
      .writeStream.outputMode("append").format("memory").queryName("fwd_drop").start()
    try {
      // key 1 receives ONLY right ticks — with no pending left its state
      // must still get a wake and drop once the watermark passes them
      input.addData(tickK(1, 10, false, 910), tickK(1, 12, false, 912))
      q.processAllAvailable()
      // key 2's far-future right pushes the watermark way past key 1
      input.addData(tickK(2, 400, false, 940))
      var stateRows = Long.MaxValue
      var i = 0
      while (i < 30 && stateRows > 1) {
        q.processAllAvailable()
        Thread.sleep(300)
        stateRows = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(Long.MaxValue)
        i += 1
      }
      // key 2's above-watermark right legitimately stays (1 row); key 1's
      // two rights must be gone — before the wake fix they lived forever
      assert(stateRows <= 1, s"stranded state rows: $stateRows")
    } finally q.stop()
  }

  test("as-of tie-break on equal right timestamps matches batch, both directions") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // two rights TIED at t=30 with values INVERTED vs ids (the max-value
    // row has the smaller id), so a tie-break on id alone and one on
    // (value, id) give different winners — only the declared contract
    // passes; lefts probe the tie from both sides
    val data = Seq(tick(20, true, 20), tick(30, false, 931, 5.0), tick(30, false, 932, 1.0),
      tick(35, true, 35), tick(200, true, 200))

    def runStream(mk: org.apache.spark.sql.Dataset[StreamingAsOf.Tick] =>
        org.apache.spark.sql.Dataset[StreamingAsOf.AsOfMatch], name: String): Map[Long, Option[Long]] = {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingAsOf.Tick]
      val ticks = input.toDS().withWatermark("ts", "5 seconds").as[StreamingAsOf.Tick]
      val q = mk(ticks).writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        input.addData(data: _*)
        StreamingAsOf.drainToFixpoint(q, () => spark.table(name).count())
        spark.table(name).collect()
          .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      } finally q.stop()
    }
    val fwdStream = runStream(StreamingAsOf.joinForward(_, toleranceMicros = 60L * 1000000), "tie_fwd")
    val bwdStream = runStream(StreamingAsOf.joinBackward, "tie_bwd")

    // batch twins on the same rows with payload ordered (value, id) —
    // the shape the streaming contract declares parity for: the batch
    // carry resolves tied rights to the max payload struct, which is
    // then the same max-(value, id) row streaming picks
    val clicks = data.filter(_.isLeft).map(t => (t.id, 1L, t.tsMicros)).toDF("event_id", "user_id", "us")
    val views = data.filterNot(_.isLeft).map(t => (1L, t.tsMicros, t.value, t.id))
      .toDF("user_id", "us", "view_value", "view_id")
    def collectBatch(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    val fwdBatch = collectBatch(graft.ops.AsOf.joinForward(
      clicks, views, Seq("user_id"), "us", "us", Seq("view_value", "view_id"),
      tolerance = Some(60L * 1000000)))
    val bwdBatch = collectBatch(graft.ops.AsOf.joinBackward(
      clicks, views, Seq("user_id"), "us", "us", Seq("view_value", "view_id")))

    for (id <- Seq(20L, 35L)) {
      assert(fwdStream.get(id).contains(fwdBatch(id)), s"fwd left $id: $fwdStream vs $fwdBatch")
      assert(bwdStream.get(id).contains(bwdBatch(id)), s"bwd left $id: $bwdStream vs $bwdBatch")
    }
    // the tie itself: both APIs take the max-(value, id) right — id 931,
    // NOT the max-id row 932
    assert(fwdBatch(20L).contains(931L))
    assert(bwdBatch(35L).contains(931L))
  }

  test("parquet file sink with checkpoint: stream out equals batch in, restart appends nothing") {
    val outDir = java.nio.file.Files.createTempDirectory("sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString
    def run(): Unit = {
      val q = EventsStream.read(spark, streamDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val expected = graft.Tables.events(spark, sf).count()
    assert(spark.read.parquet(outDir).count() == expected)
    // restart against the SAME checkpoint: the committed source offsets
    // must prevent re-emitting (the file sink's exactly-once contract)
    run()
    assert(spark.read.parquet(outDir).count() == expected, "restart duplicated rows")
    assert(spark.read.parquet(outDir).select("event_id").distinct().count() == expected)
  }

  test("mapGroupsWithState accumulates running user totals") {
    import spark.implicits._
    val events = EventsStream.read(spark, streamDir)
      .select($"event_id", $"ts".cast("timestamp"), $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val q = EventsStream.runningUserTotals(events)
      .writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("state_out")
      assert(out.count() > 0)
      val batchTotals = graft.Tables.events(spark, sf)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // final state per user matches the batch count
      val lastPerUser = out.groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lastPerUser == batchTotals)
    } finally q.stop()
  }

  test("transformWithState running totals == mapGroupsWithState (RocksDB store)") {
    import spark.implicits._
    // the new arbitrary-state API only runs on the RocksDB provider;
    // scope the conf to this query and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = EventsStream.read(spark, streamDir)
      .select($"event_id", $"ts".cast("timestamp"), $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val q = EventsStream.runningUserTotalsTws(events)
      .writeStream.outputMode("update")
      .format("memory").queryName("tws_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("tws_out")
      val batchTotals = graft.Tables.events(spark, sf)
        .groupBy("user_id").agg(count(lit(1)).as("n"),
          sum(col("value")).as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // max_by pairs total with ITS final row — two independent max()es
      // would only agree because fixture values are all positive (the
      // running total is monotone iff values are non-negative)
      val lastPerUser = out.groupBy("user_id")
        .agg(max("n_events").as("n"),
          org.apache.spark.sql.functions.max_by(col("total_value"), col("n_events")).as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(lastPerUser.view.mapValues(_._1).toMap ==
        batchTotals.view.mapValues(_._1).toMap)
      // totals agree to fp tolerance (summation order differs)
      lastPerUser.foreach { case (u, (_, v)) =>
        assert(math.abs(v - batchTotals(u)._2) < 1e-6, s"user $u") }
    } finally {
      // restore the provider even when stop() throws — a leaked RocksDB
      // conf would silently re-platform every later streaming test
      try q.stop()
      finally saved match {
        case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ListState recent history keeps exactly the last k values per user") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = EventsStream.read(spark, streamDir)
      .select($"event_id", $"ts".cast("timestamp"), $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val k = 5
    val q = EventsStream.recentHistory(events, k)
      .writeStream.outputMode("update")
      .format("memory").queryName("hist_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hist_out").as[EventsStream.UserHistory].collect()
      val got = rows.map(h => h.user_id -> h.recent_values).toMap
      // one update row per user <=> the staged fixture ran as a single
      // micro-batch; with several batches .toMap could keep a STALE
      // intermediate history and fail flakily — fail loudly instead
      assert(rows.length == got.size,
        "fixture produced multiple batches; pick the last row per user explicitly")
      // batch oracle: last k values per user in (ts µs, event_id) order
      // — µs, not raw nanos: nanosToTs floors the streamed timestamps
      // to µs, so the processor can only order at that precision
      val expected = graft.Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .collect()
        .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 1000L), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1)
        .map { case (u, rows) =>
          u -> rows.sortBy(r => (r._2, r._3)).takeRight(k).map(_._4).toSeq }
      assert(got.keySet == expected.keySet)
      got.foreach { case (u, vs) => assert(vs == expected(u), s"user $u") }
    } finally {
      try q.stop()
      finally saved match {
        case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
