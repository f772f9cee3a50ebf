package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, feature
  * flow into [[Similarity]] — is real and tested. The actual codec step
  * is STUBBED with a deterministic fake (this container ships no
  * image/audio libraries): [[MediaCodec.decodeStub]] is the single seam
  * where a real JNI/FFI decoder would plug in, consuming the same
  * `Array[Byte]` and producing the same `DecodedMedia` shape.
  */
object Multimodal {

  case class MediaMeta(mediaType: String, format: String, width: Int, height: Int)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, mediaType: String, n_bytes: Int,
      checksum: Long, embedding: Array[Float])

  object MediaCodec {
    /** STUB — deterministic fake decode. A real implementation would
      * dispatch on `meta.format` to an image/audio decoder; everything
      * downstream (batching, schema, feature flow) is identical.
      */
    def decodeStub(meta: MediaMeta, payload: Array[Byte]): Array[Float] = {
      // 32-bin byte histogram, L1-normalized — a stand-in "embedding"
      val hist = new Array[Float](32)
      payload.foreach(b => hist((b & 0xFF) / 8) += 1f)
      val total = math.max(1f, payload.length.toFloat)
      hist.map(_ / total)
    }

    def checksum(payload: Array[Byte]): Long =
      payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xFF))
  }

  /** Wrap any table's string column as a binary media payload — the
    * fixture generator for tests (real pipelines read binary columns
    * straight from parquet).
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col(idCol).as("media_id"),
        struct(
          lit("image").as("mediaType"),
          lit("fake/raw").as("format"),
          (length(col(textCol)) % 64 + 1).cast("int").as("width"),
          lit(1).cast("int").as("height")).as("meta"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode + feature extraction: one codec instance per
    * partition (the expensive part for a real decoder), rows streamed
    * through it — the standard Spark shape for binary-blob processing.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs allocate here, once per task
      rows.map { r =>
        val emb = MediaCodec.decodeStub(r.meta, r.payload)
        MediaFeatures(r.media_id, r.meta.mediaType, r.payload.length,
          MediaCodec.checksum(r.payload), emb)
      }
    }
  }

  /** Deterministic frame sampling: every nth byte-slice of the payload
    * as a "frame" (stub for video frame extraction; same partitioned
    * explode shape).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 16, everyNth: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (frame, idx) => (r.media_id, idx, frame) }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Deterministic resize: nearest-"pixel" subsampling of the payload to
    * a target width (stub for image resize — a real implementation would
    * decode, scale, re-encode; the meta/payload CONTRACT is the real
    * part: output meta reflects the new dimensions, payload length
    * scales accordingly, id is preserved). Same per-partition batch
    * shape as [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRow], targetWidth: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetWidth > 0, "targetWidth must be positive")
    media.mapPartitions { rows =>
      rows.map { r =>
        val w = math.max(1, r.meta.width)
        val out =
          if (targetWidth >= w) r.payload
          else {
            // nearest-neighbor over the byte raster: keep byte i*w/targetWidth
            val perRow = math.max(1, r.payload.length / math.max(1, r.meta.height) / w)
            val keep = (0 until (r.payload.length / math.max(1, perRow * w)) * targetWidth)
              .map { i =>
                val row = i / targetWidth; val c = i % targetWidth
                (row * w + c.toLong * w / targetWidth).toInt * perRow
              }
              .filter(_ < r.payload.length)
            keep.map(r.payload).toArray
          }
        MediaRow(r.media_id,
          r.meta.copy(width = math.min(targetWidth, w),
            height = r.meta.height), out)
      }
    }
  }

  /** Media near-dup detection: features → cosine pairs (composition with
    * the similarity operators; this is the 100 TB dedup path for
    * non-text modalities).
    */
  def mediaDupPairs(media: Dataset[MediaRow], minSim: Double = 0.999): DataFrame =
    Similarity.cosineDupPairs(
      extractFeatures(media).toDF().withColumnRenamed("media_id", "vec_id"), minSim)
}
