package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.ops.Approx

/** Cross-batch Count-Min sketch: a STREAM of items folded into one
  * persisted depth×width counter table — the continuous point-frequency
  * monitor next to [[StreamingHeavyHitters]]'s top-k (space-saving
  * answers "what is heavy", the CMS answers "how often is THIS key"
  * for keys chosen after the fact).
  *
  * Per micro-batch: [[Approx.cmsSketch]] summarizes the batch, the
  * stored sketch is read back, and both merge by cell-wise addition
  * ([[Approx.cmsMerge]]) — counters are sums, so the merged sketch
  * EQUALS the batch-built sketch of everything ingested, cell for
  * cell (no approximation is introduced by streaming; the spec pins
  * stream == batch exactly). State is ≤ depth·width rows BY
  * CONSTRUCTION, so the driver-side materialize-then-rewrite (which
  * breaks Spark's read-own-overwrite cycle on the state directory) is
  * O(sketch), never O(stream). Query estimates any time with
  * [[Approx.cmsEstimate]] over the stored state — same depth/width,
  * they are the hash function.
  */
object StreamingCms {

  val stateSchema: StructType = StructType(Seq(
    StructField("row_i", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** One fold step: batch → sketch, cell-wise merge with the stored
    * sketch. Pure on its inputs — the streaming sink and the spec
    * share this code path.
    */
  def mergeStep(batch: DataFrame, state: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    Approx.cmsMerge(Approx.cmsSketch(batch, itemCol, depth, width), state)

  /** Fold the stream into the sketch at `statePath` (parquet,
    * single-writer overwrite). Callers own stop(); estimate with
    * `Approx.cmsEstimate(spark.read.parquet(statePath), keys, ...)`.
    */
  def startAt(itemsStream: DataFrame, itemCol: String, statePath: String,
      checkpoint: String, depth: Int = 4, width: Int = 512,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = itemsStream.sparkSession
    itemsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = graft.fs.Fs.getFileSystem(
          spark.sparkContext.hadoopConfiguration, statePath)
        val state =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            spark.read.schema(stateSchema).parquet(statePath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], stateSchema)
        // sketch-bounded collect breaks the read-own-overwrite cycle
        val merged = mergeStep(batch, state, itemCol, depth, width)
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
