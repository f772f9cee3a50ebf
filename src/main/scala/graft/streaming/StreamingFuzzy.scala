package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Fuzzy

/** Online entity resolution: a STREAM of dirty/scraped records matched
  * per micro-batch against the persisted catalog index
  * ([[Fuzzy.writeCatalogIndex]]) — the record-linkage member of the
  * swap-aware serving family (LSH / IVF / PQ / hybrid / minhash all
  * serve the same way).
  *
  * Per-trigger cost is the batch's own gram prefixes (ranked under the
  * index's STORED df order) equi-joined into the prebuilt prefix
  * table + a candidate-sized levenshtein verify — the catalog is never
  * re-grammed. A catalog [[Fuzzy.updateCatalogIndex]] /
  * [[Fuzzy.forgetCatalogIndex]] / rebuild that lands between
  * micro-batches is picked up by the next batch with NO stream restart
  * (params + df + data co-swap in one directory rename); a batch racing
  * the swap's rename window parks and retries
  * ([[graft.ext.IndexLifecycle.retryingDuringSwap]]).
  */
object StreamingFuzzy {

  /** Match each micro-batch of `dirtyStream` (idCol, strCol) against
    * the catalog index at `indexPath`, appending
    * (id_a, match_id, dist, n_candidates) parquet to `outPath` — one
    * code path with [[Fuzzy.entityMatchIndexed]], so the spec pins
    * stream == batch exactly.
    */
  def startAt(dirtyStream: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, idCol: String = "id", strCol: String = "s",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = dirtyStream.sparkSession
    dirtyStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ext.IndexLifecycle.retryingDuringSwap() {
          Fuzzy.entityMatchIndexed(spark, batch, indexPath, strCol, idCol)
            .write.mode("append").parquet(outPath)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
