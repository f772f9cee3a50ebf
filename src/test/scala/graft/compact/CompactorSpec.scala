package graft.compact

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CompactorSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark

  test("figureOutNumberOfPartitions heuristic") {
    // median >= target → skip
    assert(Compactor.figureOutNumberOfPartitions(Seq(200L << 20, 150L << 20), 100) == -1)
    // single file → skip
    assert(Compactor.figureOutNumberOfPartitions(Seq(1L), 100) == -1)
    // 64 x 1MB files at 100MB target → 1 output file
    assert(Compactor.figureOutNumberOfPartitions(Seq.fill(64)(1L << 20), 100) == 1)
    // 300MB total in 30 files → 3 outputs
    assert(Compactor.figureOutNumberOfPartitions(Seq.fill(30)(10L << 20), 100) == 3)
  }

  test("doAutoCoalesce compacts many small files preserving data") {
    val dir = "file:" + Files.createTempDirectory("compact").toFile.getAbsolutePath + "/t"
    val li = spark.read.parquet(s"${SparkTestSession.sf}/lineitem.parquet")
    li.repartition(16).write.parquet(dir)
    // decimal sum: exact + associative, immune to partition-order fp drift
    def snapshot() = spark.read.parquet(dir)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")), count(lit(1))).head
    val before = snapshot()
    val n = Compactor.doAutoCoalesce(dir, requestedSizeMb = 100)
    assert(n == 1, s"expected 1 output file, got $n")
    val filesAfter = new java.io.File(dir.stripPrefix("file:")).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(filesAfter == 1)
    assert(snapshot() == before)
  }

  test("distributed leaf listing equals the driver listing") {
    val dir = "file:" + Files.createTempDirectory("compact_leaves").toFile.getAbsolutePath + "/t"
    val li = spark.read.parquet(s"${SparkTestSession.sf}/lineitem.parquet")
      .withColumn("y", date_format(col("l_shipdate"), "yyyy"))
      .withColumn("rf", col("l_returnflag"))
    li.limit(2000).write.partitionBy("y", "rf").parquet(dir)
    val driver = Compactor.getLowestFoldersPaths(dir).toSet
    val dist = Compactor.getLowestFoldersPaths(dir, distributedListing = true).toSet
    assert(driver.nonEmpty)
    assert(dist == driver, s"only-driver=${(driver -- dist).take(3)} only-dist=${(dist -- driver).take(3)}")
  }

  test("doItAll compacts each leaf partition dir") {
    val dir = "file:" + Files.createTempDirectory("compact_all").toFile.getAbsolutePath + "/t"
    val li = spark.read.parquet(s"${SparkTestSession.sf}/lineitem.parquet")
      .withColumn("m", date_format(col("l_shipdate"), "yyyy"))
    li.repartition(8).write.partitionBy("m").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val results = Compactor.doItAll(dir, requestedSizeMb = 100, concurrency = 4)
    assert(results.nonEmpty && results.values.forall(v => v == 1 || v == -1))
    assert(spark.read.parquet(dir).count() == before)
  }
}
