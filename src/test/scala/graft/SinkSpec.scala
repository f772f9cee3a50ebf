package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S12: partitioned Hive-table sink with dynamic partition overwrite —
  * an insert overwrites only the partitions it touches.
  */
class SinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dynamic partition overwrite replaces only touched partitions") {
    val root = "file:" + Files.createTempDirectory("dyn_sink").toFile.getAbsolutePath
    spark.sql("CREATE DATABASE IF NOT EXISTS sink_db")
    val li = Tables.lineitem(spark, SparkTestSession.sf)
      .withColumn("y", date_format(col("l_shipdate"), "yyyy"))
      .select("l_orderkey", "l_quantity", "y")
    li.write.partitionBy("y").option("path", s"$root/t").saveAsTable("sink_db.t")
    val before = spark.table("sink_db.t").groupBy("y").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // overwrite just year 2000 with a single sentinel row
      spark.createDataFrame(Seq((999999L, 1.0, "2000")))
        .toDF("l_orderkey", "l_quantity", "y")
        .write.mode("overwrite").insertInto("sink_db.t")
      val after = spark.table("sink_db.t").groupBy("y").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after("2000") == 1L)
      (before - "2000").foreach { case (y, n) => assert(after(y) == n, s"partition $y changed") }
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }
}
