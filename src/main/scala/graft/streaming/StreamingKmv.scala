package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Approx

/** Continuous distinct-count estimation over an ingest stream with
  * k rows of state, total: each micro-batch sketches ITSELF
  * ([[Approx.kmvSketch]] — distinct of an 8-byte hash + TakeOrdered),
  * merges into the persisted sketch artifact
  * ([[Approx.mergeIntoKmvSketch]] — mergeability makes the running
  * artifact EQUAL the sketch of all data ever ingested, not an
  * approximation of it), and appends one `(n_sketch, distinct_est)`
  * report row.
  *
  * This is the streaming face of the d26 corpus-overlap machinery:
  * the same artifact a batch job writes with [[Approx.writeKmvSketch]]
  * keeps absorbing a stream, and any reader can overlap it against
  * another corpus sketch at any time — "how many distinct documents
  * has this crawl seen, and how much does it overlap yesterday's?"
  * answered from kilobytes while the stream runs. State never grows:
  * exactly-once accuracy of an exact `approx == distinct count` would
  * need content-scale state; the sketch holds k rows forever.
  *
  * Swap-aware like every serving family: a concurrent batch rebuild /
  * overlap read parks through the rename window
  * ([[graft.ext.IndexLifecycle.retryingDuringSwap]]).
  */
object StreamingKmv {

  /** Absorb `stream`'s `valueCol` into the sketch at `sketchPath`
    * (pre-created with [[Approx.writeKmvSketch]] — k rides the
    * sidecar), appending the post-merge estimate row to `outPath`
    * per trigger.
    */
  def start(stream: DataFrame, valueCol: String, sketchPath: String,
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ext.IndexLifecycle.retryingDuringSwap() {
          Approx.mergeIntoKmvSketch(spark, batch, col(valueCol), sketchPath)
          val k = Approx.readKmvParams(spark, sketchPath).get
          Approx.kmvDistinct(spark.read.parquet(sketchPath), k)
            .write.mode("append").parquet(outPath)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
