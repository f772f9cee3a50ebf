package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming incremental near-dedup: a document STREAM probed against a
  * persisted corpus minhash index ([[graft.ext.Dedup.minhashIndex]]) —
  * the ingest pipeline's online shape. Two surfaces:
  *
  *  - [[candidatePairs]]: fully declarative stream-static equi-join on
  *    (band, bandHash). The stream side is NARROW (native minhash
  *    signature + band explode — no aggregation), and a stream-static
  *    inner join is STATELESS, so this runs in append mode with no
  *    watermark and no state store: per micro-batch cost is
  *    O(|batch| · bucket fan-in), never touching corpus text. A pair
  *    matching in several bands is emitted once per matching band —
  *    exact-at-least-once candidate semantics; the verification layer
  *    dedups (streaming-global dropDuplicates would grow state without
  *    bound for no benefit).
  *  - [[start]]: the production composition via foreachBatch — each
  *    micro-batch runs the BATCH operator
  *    ([[graft.ext.Dedup.minhashDedupNewPairs]] with `corpusIndex`), so
  *    the streaming path inherits candidate dedupe, exact-Jaccard
  *    verification, within-batch new×new pairs, and the supersede
  *    anti-join — one code path, two execution modes (the spec pins
  *    stream output == batch operator output on the same batches).
  *
  * Scale note: the index side of the per-batch join is a parquet
  * artifact laid out on (band, bandHash) by
  * [[graft.ext.Dedup.writeMinhashIndex]]; small batches broadcast
  * against it, so the corpus-sized side never shuffles per trigger.
  * New docs do NOT update the index mid-stream — near-dups arriving in
  * different micro-batches pair only against the static corpus, the
  * same contract as repeated batch ingest against a point-in-time
  * index; rebuild/append the index downstream of acceptance.
  */
object StreamingDedup {

  /** Stateless stream-static candidate join: (id_new, id_corpus) per
    * matching band. `docsStream` is a streaming DataFrame of
    * (idCol, textCol); `corpusIndex` a static [[Dedup.minhashIndex]].
    */
  def candidatePairs(docsStream: DataFrame, corpusIndex: DataFrame,
      n: Int = 3, k: Int = 32, bands: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val streamBanded = Dedup.bandSignature(
      Dedup.minhashSignatures(docsStream, n, k, textCol, idCol), k, bands)
    streamBanded.as("a")
      .join(corpusIndex.as("b"),
        col("a.band") === col("b.band") && col("a.bandHash") === col("b.bandHash")
          && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.band").as("band"))
  }

  /** Run the full verified dedup per micro-batch and append the pairs
    * as parquet. Returns the started query; callers own stop().
    */
  def start(docsStream: DataFrame, corpus: DataFrame, corpusIndex: DataFrame,
      outPath: String, checkpoint: String,
      n: Int = 3, k: Int = 32, bands: Int = 16, minJaccard: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.minhashDedupNewPairs(batch, corpus, n, k, bands, minJaccard,
            textCol, idCol, corpusIndex = Some(corpusIndex))
          .write.mode("append").parquet(outPath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** [[start]] against a persisted index PATH, re-resolving files AND
    * the (n, k, bands) sidecar per micro-batch — the text twin of
    * [[StreamingSimilarity.startAt]]: an
    * [[graft.ext.IndexLifecycle.rebuildMinhashIndex]] swap landing
    * between micro-batches is picked up by the next batch with no
    * stream restart, and a rebuild that changed the signature
    * parameters re-tunes the probe side automatically.
    */
  def startAt(docsStream: DataFrame, corpus: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, minJaccard: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a batch racing swapIn's rename pair parks instead of failing
        // the query — see IndexLifecycle.retryingDuringSwap
        graft.ext.IndexLifecycle.retryingDuringSwap() {
          Dedup.minhashDedupNewPairsAt(spark, batch, corpus, indexPath, minJaccard,
              textCol, idCol)
            .write.mode("append").parquet(outPath)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
