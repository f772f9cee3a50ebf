package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.TopK

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("custom operator equals the window row_number formulation") {
    val orders = spark.read.parquet(s"${SparkTestSession.sf}/orders.parquet")
    val custom = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val declarative = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom.nonEmpty)
    assert(custom == declarative)
  }

  test("plan uses TopKPerKeyExec with a single exchange and no Window") {
    val orders = spark.read.parquet(s"${SparkTestSession.sf}/orders.parquet")
    val plan = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("injected pruning rule pushes projection below the custom node") {
    import spark.implicits._
    val df = Seq((1L, 2L, "wide_payload"), (1L, 3L, "wide_payload2")).toDF("k", "v", "wide")
    val out = TopK.perKey(df, Seq("k"), Seq(("v", true)), 1).select("k", "v")
    val lines = out.queryExecution.optimizedPlan.toString.split("\n")
    val idx = lines.indexWhere(_.contains("TopKPerKey"))
    assert(idx >= 0, lines.mkString("\n"))
    // the pushed Project may be folded further (e.g. into LocalRelation);
    // the invariant is that the node's child no longer carries `wide`
    val childLine = lines(idx + 1)
    assert(!childLine.contains("wide"), lines.mkString("\n"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 3L)))
  }

  test("groups smaller than k pass through whole; empty keys = global top-k") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val perKey = TopK.perKey(df, Seq("k"), Seq(("v", true)), k = 10)
    assert(perKey.count() == 3)
    val global = TopK.perKey(df, Seq.empty, Seq(("v", true)), k = 2)
      .select("v").as[Int].collect().toSet
    assert(global == Set(5, 2))
  }
}
