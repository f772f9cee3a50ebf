package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Approx

/** The streaming KMV contract: because the sketch is mergeable, the
  * running artifact is EXACTLY the batch sketch of everything ever
  * ingested — stream == batch is an equality here, not an error band.
  */
class StreamingKmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("running sketch == batch sketch of all ingested data; state stays k rows; estimate appended per trigger") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val k = 64
    val root = java.nio.file.Files.createTempDirectory("graft_kmv_stream")
      .toFile.getAbsolutePath
    val sketchPath = s"$root/sketch"
    val seed = (0 until 100).map(i => s"seed_$i")
    Approx.writeKmvSketch(seed.toDF("v"), col("v"), k, sketchPath)
    val b1 = (50 until 400).map(i => s"seed_$i")   // overlaps the seed
    val b2 = (0 until 300).map(i => s"other_$i")   // disjoint values
    val input = MemoryStream[String]
    val q = StreamingKmv.start(input.toDF().toDF("v"), "v",
      sketchPath, s"$root/out", s"$root/ckpt")
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(sketchPath)
      .orderBy(col("h")).collect().map(_.getLong(0)).toSeq
    val batch = Approx.kmvSketch((seed ++ b1 ++ b2).toDF("v"), col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == batch,
      "running sketch drifted from the batch sketch of the same data")
    assert(streamed.length == k, s"state must be exactly k rows, got ${streamed.length}")
    // one estimate row per trigger, final estimate within the KMV band
    // of the true distinct count (700)
    val out = spark.read.parquet(s"$root/out").collect()
    assert(out.length == 2, s"expected one report row per trigger, got ${out.length}")
    val finalEst = Approx.kmvDistinct(spark.read.parquet(sketchPath), k)
      .head.getLong(1)
    assert(math.abs(finalEst - 700).toDouble / 700 <= 3.0 / math.sqrt(k),
      s"final estimate $finalEst outside the 3/sqrt(k) band of 700")
    // the artifact overlaps like any other sketch: against itself,
    // jaccard is exactly 1
    val ov = Approx.kmvOverlap(spark.read.parquet(sketchPath),
      spark.read.parquet(sketchPath), k).head
    assert(ov.getLong(3) == 1000000L)
    // a non-sketch path fails loudly
    intercept[IllegalArgumentException] {
      Approx.mergeIntoKmvSketch(spark, b1.toDF("v"), col("v"), s"$root/nope")
    }
  }
}
