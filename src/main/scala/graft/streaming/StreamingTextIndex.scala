package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.TextOps

/** Continuous inverted-index maintenance: a STREAM of documents folded
  * into a persisted [[TextOps.writeTextIndex]] artifact — the crawler
  * tail of the retrieval/decontamination family. The first micro-batch
  * bootstraps the index; every later one folds in through
  * [[TextOps.updateTextIndex]] (stale-drop + batch tokenize + exact
  * stats + fuse-guarded swap), so re-ingested ids supersede their old
  * content mid-stream exactly as they do in batch. The folded artifact
  * EQUALS the batch-built index of everything ingested (postings,
  * docs, and stats — spec-pinned), so [[TextOps.bm25ServeIndexed]]
  * answers queries off it any time with from-scratch-identical scores.
  * Per-batch cost is tokenize(batch) + an index rewrite — never a
  * corpus re-tokenize; the artifact lives on disk, no driver-side
  * state at all.
  */
object StreamingTextIndex {

  def startAt(docsStream: DataFrame, path: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!TextOps.isTextIndex(spark, path))
          TextOps.writeTextIndex(batch, path, idCol, textCol)
        else
          TextOps.updateTextIndex(spark, batch, path, idCol, textCol)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The tf-idf sibling of [[startAt]]: fold a document stream into a
    * persisted [[TextOps.writeTfidfIndex]] artifact (the ELEVENTH
    * lifecycle family's continuous member). Bootstrap on the first
    * micro-batch, [[TextOps.updateTfidfIndex]] after — stale rows of
    * re-ingested ids drop, df/idf/norms recompute from the merged tf
    * grain (corpus statistics are global by construction), and the
    * build promotes through the fuse-guarded swap, so
    * [[TextOps.tfidfCosineTopKAt]] serves from-scratch-identical
    * cosines off the folded state at any time (spec-pinned). Per-batch
    * cost is tokenize(batch) + the integer-narrow derived-stat
    * recompute — never a corpus re-tokenize.
    */
  def startAtTfidf(docsStream: DataFrame, path: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!TextOps.isTfidfIndex(spark, path))
          TextOps.writeTfidfIndex(batch, path, idCol = idCol, textCol = textCol)
        else
          TextOps.updateTfidfIndex(spark, batch, path, idCol, textCol)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
