package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Error-bound pins for the approximate scale alternates: if a Spark
  * upgrade or wrapper edit degrades sketch accuracy past the declared
  * bound, these fail before a pipeline silently drifts.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("HLL distinct count lands within the declared rsd of the exact count") {
    val orders = Tables.orders(spark, sf)
    val exact = orders.agg(countDistinct(col("o_custkey"))).head.getLong(0)
    val approx = Approx.distinctCustomers(orders, rsd = 0.05).head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.15, f"HLL rel err $relErr%.3f vs exact $exact (3x rsd bound)")
  }

  test("approx percentiles land within one rank-error step of the exact values") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.agg(expr("percentile(l_extendedprice, array(0.5, 0.95))")).head
      .getSeq[Double](0)
    val approx = li.agg(Approx.percentiles(col("l_extendedprice"), Seq(0.5, 0.95))).head
      .getSeq[Double](0)
    // percentile_approx returns a value whose RANK is within n/accuracy
    // of the target; translate to a loose value bound via the exact
    // neighboring percentiles
    val p40 = li.agg(expr("percentile(l_extendedprice, 0.40)")).head.getDouble(0)
    val p60 = li.agg(expr("percentile(l_extendedprice, 0.60)")).head.getDouble(0)
    assert(approx(0) >= p40 && approx(0) <= p60,
      s"approx p50 ${approx(0)} outside exact [p40=$p40, p60=$p60] (exact p50 ${exact(0)})")
    val p90 = li.agg(expr("percentile(l_extendedprice, 0.90)")).head.getDouble(0)
    assert(approx(1) >= p90, s"approx p95 ${approx(1)} below exact p90 $p90")
  }

  test("sketches are deterministic for a fixed input") {
    val orders = Tables.orders(spark, sf)
    val a = Approx.distinctCustomers(orders).head.getLong(0)
    val b = Approx.distinctCustomers(orders).head.getLong(0)
    assert(a == b)
  }

  test("space-saving: exact at saturating capacity; bounds + guarantee hold when tight") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "").cache()
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // saturating: capacity >> vocab → every estimate exact, error 0
    val sat = Approx.spaceSavingTopK(toks, "token", k = 10, capacity = 1024).collect()
    sat.foreach { r =>
      assert(r.getLong(2) == 0, s"eviction fired below vocab size: $r")
      assert(r.getLong(1) == exact(r.getString(0)), s"estimate not exact: $r")
    }
    val exactTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1)
    assert(sat.map(_.getString(0)).sameElements(exactTop))
    // tight capacity (vocab ~31 >> 8 slots): space-saving bounds must
    // still hold for every reported token — est−err ≤ true ≤ est —
    // and any token with true freq > n/capacity must be reported
    val tight = Approx.spaceSavingTopK(toks, "token", k = 8, capacity = 8).collect()
    tight.foreach { r =>
      val (tok, est, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val truth = exact.getOrElse(tok, 0L)
      assert(truth <= est, s"$tok: sketch underestimates ($est < $truth)")
      assert(est - err <= truth, s"$tok: lower bound broken ($est-$err > $truth)")
    }
    val reported = tight.map(_.getString(0)).toSet
    val mustReport = exact.filter { case (_, c) => c > n / 8 }.keySet
    assert(mustReport.subsetOf(reported),
      s"missed guaranteed heavy hitters: ${mustReport -- reported}")
    toks.unpersist()
  }
}
