package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.ops.Approx

/** Cross-batch histogram sketch: a STREAM of values folded into one
  * persisted equi-width counter table — the continuous quantile
  * monitor next to [[StreamingCms]]'s point frequencies and
  * [[StreamingKmv]]'s distinct counts ("where does the p99 document
  * length sit RIGHT NOW" over everything ingested so far).
  *
  * Per micro-batch: [[Approx.histSketch]] summarizes the batch, the
  * stored sketch is read back, and both merge by cell-wise addition
  * ([[Approx.histMerge]]) — counters are sums, so the folded state
  * EQUALS the batch-built sketch of everything ingested, cell for
  * cell (streaming introduces no approximation; the spec pins
  * stream == batch exactly, and quantile brackets served off the
  * state carry the same one-bin-width guarantee). State is ≤
  * `buckets` rows BY CONSTRUCTION, so the driver-side
  * materialize-then-rewrite (which breaks Spark's read-own-overwrite
  * cycle on the state directory) is O(sketch), never O(stream).
  * Query any time with [[Approx.histQuantiles]] over the stored
  * state — same lo/hi/buckets, they are the bin function.
  */
object StreamingHist {

  val stateSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** One fold step: batch → sketch, cell-wise merge with the stored
    * sketch. Pure on its inputs — the streaming sink and the spec
    * share this code path.
    */
  def mergeStep(batch: DataFrame, state: DataFrame, valueCol: String,
      lo: Long, hi: Long, buckets: Int): DataFrame =
    Approx.histMerge(
      Approx.histSketch(batch, col(valueCol), lo, hi, buckets), state)

  /** Fold the stream into the sketch at `statePath` (parquet,
    * single-writer overwrite). Callers own stop(); estimate with
    * `Approx.histQuantiles(spark.read.parquet(statePath), ...)`.
    */
  def startAt(valuesStream: DataFrame, valueCol: String, statePath: String,
      checkpoint: String, lo: Long, hi: Long, buckets: Int = 256,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = valuesStream.sparkSession
    valuesStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = graft.fs.Fs.getFileSystem(
          spark.sparkContext.hadoopConfiguration, statePath)
        val state =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            spark.read.schema(stateSchema).parquet(statePath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], stateSchema)
        // sketch-bounded collect breaks the read-own-overwrite cycle
        val merged = mergeStep(batch, state, valueCol, lo, hi, buckets)
          .select(col("bucket").cast("int").as("bucket"), col("cnt"))
          .collect().toSeq
        spark.createDataFrame(spark.sparkContext.parallelize(merged, 1), stateSchema)
          .write.mode("overwrite").parquet(statePath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
