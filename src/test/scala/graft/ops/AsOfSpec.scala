package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def result(tolerance: Option[Long] = None) = {
    val left = Seq(
      ("k1", 10L, "l1"), // before any right row -> null
      ("k1", 20L, "l2"), // equal ts -> inclusive match r20
      ("k1", 35L, "l3"), // latest prior is r30
      ("k2", 50L, "l4"), // other key: only k2 right rows match
      ("k3", 50L, "l5")  // key with no right rows at all
    ).toDF("k", "t", "lv")
    val right = Seq(
      ("k1", 20L, "r20", Some(1.0)),
      ("k1", 30L, "r30", None), // null payload field must NOT backfill from r20
      ("k2", 49L, "r49", Some(2.0))
    ).toDF("k", "t", "rv", "rd")
    AsOf.joinBackward(left, right, Seq("k"), "t", "t", Seq("rv", "rd"), tolerance)
      .orderBy("lv")
      .collect()
      .map(r => (r.getString(2), Option(r.getString(3)), Option(r.get(4))))
  }

  test("backward as-of: inclusive ties, latest prior wins, unmatched stay null") {
    val rows = result()
    assert(rows(0) == (("l1", None, None)))                 // nothing before t=10
    assert(rows(1) == (("l2", Some("r20"), Some(1.0))))     // tie at 20 matches
    assert(rows(2)._2 == Some("r30"))                       // latest prior row
    assert(rows(2)._3 == None)                              // r30's null rd NOT backfilled from r20
    assert(rows(3) == (("l4", Some("r49"), Some(2.0))))     // per-key isolation
    assert(rows(4) == (("l5", None, None)))                 // key without right rows
  }

  test("tolerance nulls out matches older than the bound") {
    val rows = result(tolerance = Some(3L))
    assert(rows(1)._2 == Some("r20"))  // age 0 <= 3
    assert(rows(2)._2 == None)         // age 5 > 3 -> stale
    assert(rows(3)._2 == Some("r49"))  // age 1 <= 3
  }

  test("forward as-of: earliest following right row, inclusive, tolerance-bounded") {
    val left = Seq(("k1", 10L, "l1"), ("k1", 20L, "l2"), ("k1", 31L, "l3")).toDF("k", "t", "lv")
    val right = Seq(("k1", 20L, "r20"), ("k1", 30L, "r30")).toDF("k", "t", "rv")
    def run(tol: Option[Long]) =
      AsOf.joinForward(left, right, Seq("k"), "t", "t", Seq("rv"), tol)
        .orderBy("lv").collect().map(r => Option(r.getString(3))).toSeq
    assert(run(None) == Seq(Some("r20"), Some("r20"), None))
    assert(run(Some(5L)) == Seq(None, Some("r20"), None)) // 10->20 is 10 > 5
  }

  test("as-of plan has exactly one shuffle (no range-join blowup)") {
    val left = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("t"))
    val right = spark.range(100).select(col("id").as("k"), (col("id") * 7).as("t"),
      col("id").as("payload"))
    val plan = AsOf.joinBackward(left, right, Seq("k"), "t", "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single key shuffle, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
