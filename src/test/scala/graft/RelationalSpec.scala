package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("all registered queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q02 aggregates reconcile with raw scan") {
    val li = Tables.lineitem(spark, sf)
    val total = queries.Relational.q02AggGroup(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head.getLong(0)
    assert(total == li.count())
  }

  test("q05 anti-join + inner-join partition the customer table") {
    import org.apache.spark.sql.functions._
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf).select(col("o_custkey"))
    val without = queries.Relational.q05AntiJoin(spark, sf).head.getLong(0)
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(without + withOrders == c.count())
  }

  test("q07 top-k is sorted descending") {
    val rows = queries.Relational.q07TopK(spark, sf).collect()
    val prices = rows.map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
