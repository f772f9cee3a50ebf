package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class OrcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("orc roundtrip preserves schema and data; filter pushes to the scan") {
    val dir = "file:" + Files.createTempDirectory("orc").toFile.getAbsolutePath + "/orders"
    val orders = Tables.orders(spark, SparkTestSession.sf)
    Orc.writeOrc(orders, dir)
    val back = Orc.readOrc(spark, dir)
    assert(back.schema == orders.schema)
    assert(back.count() == orders.count())
    val a = orders.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
    // the engine benefit being claimed: the predicate must reach the ORC
    // scan as a pushed filter, not run as a post-scan Filter only
    val q = back.filter(col("o_totalprice") > 300000.0).select("o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    // the predicate itself must appear INSIDE the pushed list — the
    // bare "PushedFilters: [" prefix also matches an empty list, and
    // the column name always shows up in the post-scan Filter node
    assert(plan.contains("GreaterThan(o_totalprice"),
      s"filter not pushed to ORC scan:\n$plan")
  }
}
