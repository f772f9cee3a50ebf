package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class MultimodalSpec extends AnyFunSuite {
  implicit lazy val spark = SparkTestSession.spark
  lazy val docs = Tables.documents(spark, SparkTestSession.sf)

  test("media features: one row per media, deterministic checksum/embedding") {
    val media = Multimodal.syntheticMedia(docs)
    val f1 = Multimodal.extractFeatures(media).collect()
    assert(f1.length == docs.count())
    f1.foreach { f =>
      assert(f.embedding.length == 32)
      assert(math.abs(f.embedding.sum - 1.0f) < 1e-3) // L1-normalized histogram
      assert(f.n_bytes > 0)
    }
    val f2 = Multimodal.extractFeatures(media).collect()
    assert(f1.map(f => (f.media_id, f.checksum)).toSet ==
      f2.map(f => (f.media_id, f.checksum)).toSet)
  }

  test("frame sampling slices payloads deterministically") {
    val media = Multimodal.syntheticMedia(docs.limit(10))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyNth = 4)
    assert(frames.count() > 0)
    val bad = frames.filter(length(col("frame_payload")) > 16).count()
    assert(bad == 0)
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() == 0)
  }

  test("identical payloads are found as media duplicates") {
    import spark.implicits._
    val dupDocs = Seq((1L, "same bytes"), (2L, "same bytes"), (3L, "different"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.mediaDupPairs(Multimodal.syntheticMedia(dupDocs)).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }

  test("resize honors the meta/payload contract and is deterministic") {
    val media = Multimodal.syntheticMedia(docs)
    val resized = Multimodal.resize(media, targetWidth = 8).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    assert(resized.nonEmpty && resized.length == orig.size, "resize must be 1:1 on rows")
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.meta.width <= 8 && r.meta.width <= o.meta.width, s"width contract: ${r.meta}")
      assert(r.payload.length <= o.payload.length, "resize must not grow the payload")
    }
    // deterministic: same input -> byte-identical output
    val again = Multimodal.resize(media, targetWidth = 8).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(resized.forall(r => again(r.media_id) == r.payload.toSeq))
    // a target wider than the media is the identity
    val wide = Multimodal.resize(media, targetWidth = 1000).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(resized.nonEmpty && orig.values.forall(o => wide(o.media_id) == o.payload.toSeq))
  }
}
