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

  test("randomized oracle: 60 keys of random ticks with forced ties, both directions") {
    // small ts range forces equal-timestamp rights; payload ordered
    // (value, id) so the declared tie contract applies. One Spark job
    // covers all scenarios (keys ARE the scenarios); the oracle is a
    // direct in-memory transcription of the semantics.
    val rnd = new scala.util.Random(42L)
    case class L(k: Long, t: Long, lid: Long)
    case class R(k: Long, t: Long, v: Double, rid: Long)
    val lefts = for (k <- 0L until 60L; i <- 0 until rnd.nextInt(6))
      yield L(k, rnd.nextInt(8).toLong, k * 100 + i)
    val rights = for (k <- 0L until 60L; i <- 0 until rnd.nextInt(6))
      yield R(k, rnd.nextInt(8).toLong, rnd.nextInt(3).toDouble, k * 100 + 50 + i)
    val lDf = lefts.map(l => (l.k, l.t, l.lid)).toDF("k", "t", "lid")
    val rDf = rights.map(r => (r.k, r.t, r.v, r.rid)).toDF("k", "t", "v", "rid")
    val tol = 3L

    def oracle(forward: Boolean, tolerance: Option[Long]): Map[Long, Option[Long]] =
      lefts.map { l =>
        val cands = rights.filter(r => r.k == l.k &&
          (if (forward) r.t >= l.t else r.t <= l.t))
        val best = if (cands.isEmpty) None else {
          val ts = if (forward) cands.map(_.t).min else cands.map(_.t).max
          Some(cands.filter(_.t == ts).maxBy(r => (r.v, r.rid)))
        }
        val inTol = best.filter(r => tolerance.forall(b =>
          (if (forward) r.t - l.t else l.t - r.t) <= b))
        l.lid -> inTol.map(_.rid)
      }.toMap

    for ((forward, tolerance) <- Seq((false, None), (true, Some(tol)),
        (false, Some(tol)), (true, None))) {
      val got = (if (forward)
          AsOf.joinForward(lDf, rDf, Seq("k"), "t", "t", Seq("v", "rid"), tolerance)
        else AsOf.joinBackward(lDf, rDf, Seq("k"), "t", "t", Seq("v", "rid"), tolerance))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val want = oracle(forward, tolerance)
      assert(got.size == want.size)
      want.foreach { case (lid, rid) =>
        assert(got(lid) == rid, s"forward=$forward tol=$tolerance left $lid: got ${got(lid)}, want $rid")
      }
    }
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
