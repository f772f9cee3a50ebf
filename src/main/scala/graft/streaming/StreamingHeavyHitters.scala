package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Approx

/** Cross-batch heavy hitters: a STREAM of items folded into one
  * persisted space-saving summary — the trending-token / hot-key
  * monitor a continuous ingest pipeline runs next to dedup.
  *
  * Per micro-batch: [[Approx.spaceSavingTopK]] summarizes the batch
  * under bounded memory, the stored summary is read back, both are
  * merged by per-token (count, error) sums, and the merge is re-pruned
  * to `capacity` by the same deterministic smallest-(count, token)
  * rule — the mergeable-summaries reduction, so the space-saving
  * bounds (`est − err ≤ true ≤ est`) hold across the whole stream
  * history, not just one batch. The merged summary is ≤ capacity rows
  * BY CONSTRUCTION, so the driver-side materialize-then-rewrite (which
  * avoids Spark's read-path/overwrite-path conflict on the state
  * directory) is O(capacity), never O(stream).
  *
  * At saturating capacity no prune ever fires and the stored summary
  * equals the exact token counts of everything ingested — the spec's
  * stream == batch gate.
  */
object StreamingHeavyHitters {

  val stateSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  /** One merge step: batch → summary, union with the stored summary,
    * per-token sums, deterministic re-prune to capacity. Pure on its
    * inputs — the streaming sink and the spec share this code path.
    */
  def mergeStep(batch: DataFrame, state: DataFrame, itemCol: String,
      capacity: Int): DataFrame = {
    val batchSummary = Approx.spaceSavingTopK(batch, itemCol, k = capacity, capacity)
      .toDF("token", "est", "err")
    batchSummary.unionByName(state)
      .groupBy("token").agg(sum("est").as("est"), sum("err").as("err"))
      .orderBy(col("est").desc, col("token")).limit(capacity)
  }

  /** Fold the stream into the summary at `statePath` (parquet,
    * overwritten atomically-enough for the single writer a streaming
    * query is). Callers own stop(); read the summary any time with
    * `spark.read.parquet(statePath)`.
    */
  def startAt(itemsStream: DataFrame, itemCol: String, statePath: String,
      checkpoint: String, capacity: Int = 1024,
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
        // capacity-bounded collect breaks the read-own-overwrite cycle
        val merged = mergeStep(batch, state, itemCol, capacity).collect().toSeq
        spark.createDataFrame(spark.sparkContext.parallelize(merged, 1), stateSchema)
          .write.mode("overwrite").parquet(statePath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
