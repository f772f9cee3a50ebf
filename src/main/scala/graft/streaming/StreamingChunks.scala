package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Continuous chunk-store maintenance: a STREAM of documents folded
  * into a persisted [[Dedup.writeChunkIndex]] artifact — the ingest
  * tail of the content-defined-chunking family. The first micro-batch
  * bootstraps the store; every later one folds in through
  * [[Dedup.updateChunkIndex]] (stale-drop supersede + batch chunking
  * under the sidecar's mask + fuse-guarded swap), so re-ingested ids
  * replace their old chunk rows mid-stream exactly as they do in
  * batch. The folded artifact EQUALS the batch-built store of
  * everything ingested (spec-pinned), so
  * [[Dedup.chunkProvenanceIndexed]] answers "seen before, at chunk
  * granularity?" off it any time with from-scratch-identical counts.
  * Per-batch cost is chunk(batch) + an index rewrite — never a corpus
  * re-chunk; the artifact lives on disk, no driver-side state at all.
  */
object StreamingChunks {

  def startAt(docsStream: DataFrame, path: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text", maskBits: Int = 6,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!Dedup.isChunkIndex(spark, path))
          Dedup.writeChunkIndex(batch, path, maskBits, textCol, idCol)
        else
          Dedup.updateChunkIndex(batch, path, textCol, idCol)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
