package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming trailing-window spike detection — the continuous twin of
  * the batch e10 query: a stream of events folded into a persisted
  * per-(event_type, hour) COUNT table, with the spike report computed
  * over that table by exactly the batch arithmetic
  * (`cnt·24 > 2·Σ(trailing 24 h)`, RANGE frame on the integer hour so
  * calendar gaps count as zero traffic).
  *
  * The hourly count table is the SUFFICIENT STATISTIC of the detector:
  * counts are mergeable by plain addition, so per micro-batch the
  * batch's (type, hour) counts union with the stored table and re-sum —
  * after any prefix of the stream the state equals the batch
  * aggregation over everything ingested, which is why
  * [[spikeReport]] over the final state is row-identical to the batch
  * query (the spec's stream == batch gate).
  *
  * State is types × hours cardinality — tiny rows, bounded by
  * `retainHours` (hours older than `maxHour − retainHours` are pruned
  * at merge time; the report only ever needs 24 h of history, the
  * retention just caps how far back it can REPORT). The bounded size is
  * what makes the heavy-hitters-style driver materialize-then-rewrite
  * (which sidesteps Spark's read-own-overwrite conflict on the state
  * path) O(state), never O(stream).
  */
object StreamingSpike {

  val stateSchema: StructType = StructType(Seq(
    StructField("event_type", StringType, nullable = false),
    StructField("hour", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Per-batch hourly counts from a streaming events frame
    * (ts TimestampType; hour = epoch-µs div 3600·10⁶, the same integer
    * hour the batch side derives from epoch-nanos).
    */
  def batchHourCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("cnt"))

  /** One merge step: batch counts ∪ stored counts, per-(type, hour)
    * sums, pruned to the retention window. Pure on its inputs — the
    * streaming sink and the spec share this code path.
    */
  def mergeStep(batchCounts: DataFrame, state: DataFrame,
      retainHours: Long): DataFrame = {
    val merged = batchCounts.unionByName(state)
      .groupBy(col("event_type"), col("hour"))
      .agg(sum(col("cnt")).as("cnt"))
    val w = Window.partitionBy(lit(1)) // state-sized frame, bounded
    merged.withColumn("_max_hour", max(col("hour")).over(w))
      .filter(col("hour") > col("_max_hour") - retainHours)
      .drop("_max_hour")
  }

  /** The spike report over a (event_type, hour, cnt) table — THE
    * shared implementation of the batch e10 query and the streaming
    * detector's read side: trailing-24 h baseline as a RANGE frame on
    * the integer hour (gaps = zero traffic), integer cross-multiplied
    * spike decision, warm-up hours (< 24 h of per-type history)
    * excluded. Every window runs at type × hour cardinality.
    */
  def spikeReport(counts: DataFrame): DataFrame = {
    val trailing = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rangeBetween(-24, -1)
    val perType = Window.partitionBy(col("event_type"))
    counts
      .withColumn("baseline", coalesce(sum(col("cnt")).over(trailing), lit(0L)))
      .withColumn("_min_hour", min(col("hour")).over(perType))
      .filter(col("hour") >= col("_min_hour") + 24L)
      .select(col("event_type"), col("hour"), col("cnt"), col("baseline"),
        (col("cnt") * 24L > col("baseline") * 2L).cast("long").as("spike"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Fold the event stream into the count table at `statePath`; read
    * the live spike report any time with
    * `spikeReport(spark.read.parquet(statePath))`. Callers own stop().
    */
  def startAt(events: DataFrame, statePath: String, checkpoint: String,
      retainHours: Long = 24L * 366,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = events.sparkSession
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = graft.fs.Fs.getFileSystem(
          spark.sparkContext.hadoopConfiguration, statePath)
        val state =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            spark.read.schema(stateSchema).parquet(statePath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], stateSchema)
        val merged = mergeStep(batchHourCounts(batch), state, retainHours)
          .collect().toSeq // state-sized by construction
        spark.createDataFrame(spark.sparkContext.parallelize(merged, 1), stateSchema)
          .write.mode("overwrite").parquet(statePath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
