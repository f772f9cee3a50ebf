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
}
