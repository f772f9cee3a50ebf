package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class SkewAndBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("saltedSum equals direct groupBy sum") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
    val direct = li.groupBy("l_returnflag").agg(sum("qty").as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(li.select("l_returnflag", "qty"), Seq("l_returnflag"), "qty")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
  }

  test("saltedJoin equals direct inner join") {
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf).withColumnRenamed("n_nationkey", "c_nationkey")
    val direct = c.join(n, "c_nationkey").groupBy("n_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(c, n, "c_nationkey").groupBy("n_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    val root = "file:" + Files.createTempDirectory("buckets").toFile.getAbsolutePath
    spark.sql("CREATE DATABASE IF NOT EXISTS bk")
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$root/o").saveAsTable("bk.orders_b")
    c.withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$root/c").saveAsTable("bk.customer_b")
    val joined = spark.table("bk.orders_b").join(spark.table("bk.customer_b"), "o_custkey")
    // co-located bucketed join: no Exchange on either side
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
  }
}
