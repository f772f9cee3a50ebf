package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.Dedup

class StreamingClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def readLabels(path: String) =
    spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed labeling == batch clusters after every interleaving; cross-batch merge lands") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_cluster_stream").toFile.getAbsolutePath
    val input = MemoryStream[(Long, Long)]
    val q = StreamingClusters.startAt(
      input.toDF().toDF("id_a", "id_b"), s"$root/labels", s"$root/ckpt")
    try {
      // bootstrap: two separate clusters
      input.addData((1L, 2L), (3L, 4L))
      q.processAllAvailable()
      assert(readLabels(s"$root/labels") ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      // a single bridging pair must MERGE them, min-id preserved —
      // exactly what a batch rebuild over all pairs would produce
      input.addData((2L, 3L))
      q.processAllAvailable()
      assert(readLabels(s"$root/labels") ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      // fresh nodes arrive as their own component; empty batches are a no-op
      input.addData((10L, 11L))
      q.processAllAvailable()
      assert(readLabels(s"$root/labels") ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally q.stop()
  }

  test("fixture pairs split across batches fold to the batch labeling of the union") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("graft_cluster_stream").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture produced no pairs")
    // deterministic interleave: the split deliberately tears clusters
    // across micro-batches so the fold has real cross-batch merges
    val (b1, b2) = pairs.zipWithIndex.partition(_._2 % 2 == 0)
    val input = MemoryStream[(Long, Long)]
    val q = StreamingClusters.startAt(
      input.toDF().toDF("id_a", "id_b"), s"$root/labels", s"$root/ckpt")
    try {
      input.addData(b1.map(_._1).toIndexedSeq)
      q.processAllAvailable()
      input.addData(b2.map(_._1).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val batch = Dedup.clusters(pairs.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(readLabels(s"$root/labels") == batch,
      "streamed fold != batch clusters of the union")
  }
}
