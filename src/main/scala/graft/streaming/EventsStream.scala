package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.Cols

/** Structured Streaming over the events table (SURVEY §2.12, §7.5):
  * file-source replay of the parquet fixture → watermarked event-time
  * windows. The same aggregations run identically against a Kafka/rate
  * source on a cluster — the source is the only thing that changes.
  */
object EventsStream {

  /** The events schema with `ts` at a given encoding. File-stream
    * sources need a user-supplied schema, and the driver fixtures have
    * ALREADY flipped ts encoding once (TIMESTAMP(NANOS)→LongType in
    * one generation, TIMESTAMP(MICROS)→NTZ in the next) — so the
    * streaming path discovers the encoding per directory exactly like
    * batch [[graft.Tables.events]] does, instead of hardcoding the one
    * the current generation happens to use.
    */
  private def schemaFor(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** The MICROS-generation fixture schema (ts TIMESTAMP_NTZ) — kept for
    * callers staging their own directories.
    */
  val schema: StructType = schemaFor(TimestampNTZType)

  /** Streaming read of an events parquet DIRECTORY (file-stream sources
    * monitor directories), ts normalized to an INSTANT (session timezone
    * is pinned UTC) for event-time semantics — watermarks and windows
    * need TimestampType. The on-disk ts encoding is discovered from the
    * directory's existing footers (one batch metadata read), so both
    * fixture generations — LongType epoch-nanos under `nanosAsLong`,
    * and TIMESTAMP(MICROS)/NTZ — stream identically; see
    * [[graft.Tables.events]] for the batch twin of this normalization.
    */
  def read(spark: SparkSession, eventsDir: String): DataFrame = {
    val tsType = spark.read.parquet(eventsDir).schema("ts").dataType
    val raw = spark.readStream.schema(schemaFor(tsType)).parquet(eventsDir)
    tsType match {
      case LongType => raw.withColumn("ts", Cols.nanosToTs(col("ts")))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Stage the single-file events fixture into a temp directory so the
    * file-stream source can monitor it; returns the directory.
    */
  def stageFixture(spark: SparkSession, sfDir: String): String = {
    val out = java.nio.file.Files.createTempDirectory("events_stream").toFile
    out.deleteOnExit()
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"file:${out.getAbsolutePath}/events.parquet")
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
      dst.getFileSystem(conf), dst, false, true, conf)
    s"file:${out.getAbsolutePath}"
  }

  /** Tumbling event-time windows with a watermark: count + sum(value)
    * per (window, event_type). Late data beyond the watermark is dropped
    * — at scale this bounds state size.
    */
  def tumbling(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))

  /** Sliding windows (length, slide). */
  def sliding(events: DataFrame, length: String = "1 hour", slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Session windows: gap-based per-user sessions. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks in the preceding hour. Both sides watermarked so
    * Spark can discard buffered state past the interval — the state
    * bound that makes this viable on an unbounded stream.
    */
  def clickToPurchaseJoin(events: DataFrame, within: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $within"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Batch twin of [[clickToPurchaseJoin]] for parity checks. */
  def clickToPurchaseBatch(spark: SparkSession, dir: String, within: String = "1 hour"): DataFrame = {
    val events = graft.Tables.events(spark, dir).withColumn("ts", Cols.nanosToTs(col("ts")))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $within"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Streaming exact dedup with BOUNDED state — the streaming twin of
    * `Dedup.dropExactDuplicates`: duplicates of a key arriving within
    * the watermark horizon are dropped, and per-key state is evicted
    * once the watermark passes it (`dropDuplicatesWithinWatermark`), so
    * the dedup map never grows with stream length. Plain
    * dropDuplicates would retain every key forever — unusable on an
    * unbounded ingest pipeline.
    */
  def dedupedStream(events: DataFrame, watermark: String = "2 hours",
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  // -------- stateful processing (mapGroupsWithState) ------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via mapGroupsWithState —
    * the template for arbitrary stateful logic Spark's windowed aggs
    * can't express.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val events = batch.toSeq
          val next = UserRunning(userId,
            prev.n_events + events.size,
            prev.total_value + events.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** [[runningUserTotals]] on the arbitrary-state API that supersedes
    * mapGroupsWithState (`transformWithState`, Spark 4): typed state
    * variables with independent lifetimes and optional TTL instead of
    * one opaque blob per key. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`) — state lives off
    * the executor heap, the property that keeps unbounded keyed state
    * viable at 100 TB. StreamingSpec pins output parity with the
    * mapGroupsWithState formulation.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserRunning] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var totals: ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserRunning]("totals",
        org.apache.spark.sql.Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = if (totals.exists()) totals.get() else UserRunning(userId, 0L, 0.0)
      val batch = rows.toSeq
      val next = UserRunning(userId,
        prev.n_events + batch.size,
        prev.total_value + batch.map(_.value).sum)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  case class UserHistory(user_id: Long, recent_values: Seq[Double])

  /** Bounded per-user event history via ListState — the
    * feature-generation shape (a model wants "the user's last k
    * values" at every event). The k-bound caps state per key
    * regardless of stream length, and the trimmed list is replaced in
    * ONE `put` store operation per batch (a mapGroupsWithState value
    * would round-trip through the same single blob but without typed
    * access; ListState's `appendValue` additionally serves pure-append
    * workloads that never trim).
    */
  class RecentHistoryProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserHistory] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TTLConfig, TimeMode, TimerValues}
    @transient private var recent: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Double]("recent",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserHistory] = {
      // deterministic in-batch order: event time at FULL precision
      // (getTime alone is millis — fixture timestamps differ at µs),
      // then id as the tiebreaker
      def micros(e: Event): Long =
        e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L
      val incoming = rows.toSeq.sortBy(e => (micros(e), e.event_id)).map(_.value)
      val kept = (recent.get().toSeq ++ incoming).takeRight(k)
      recent.put(kept.toArray) // one store write, not clear + k appends
      Iterator.single(UserHistory(userId, kept))
    }
  }

  def recentHistory(events: Dataset[Event], k: Int = 5): Dataset[UserHistory] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RecentHistoryProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Batch-equivalent of [[tumbling]] for parity checks: same windows
    * computed over the static table.
    */
  def tumblingBatch(spark: SparkSession, dir: String, window: String = "1 hour"): DataFrame = {
    val events = graft.Tables.events(spark, dir).withColumn("ts", Cols.nanosToTs(col("ts")))
    events.groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
  }
}
