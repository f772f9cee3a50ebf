package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class PrefilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("bloom-prefiltered join result == plain join; prefilter actually prunes") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val hot = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"))
    val pre = Prefilter.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey")
    val joined = pre.join(hot, col("l_orderkey") === col("o_orderkey"))
    val plain = li.join(hot, col("l_orderkey") === col("o_orderkey"))
    assert(plain.count() > 0, "fixture sanity: join must match rows")
    assert(joined.count() == plain.count())
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    // the reduction is the point: the prefiltered fact side must be far
    // smaller than the full fact side, and no true match may be dropped
    val preCnt = pre.count()
    val trueMatches = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(preCnt >= trueMatches, "bloom dropped true matches")
    assert(preCnt < li.count() / 2, s"prefilter pruned nothing: $preCnt of ${li.count()}")
  }

  test("string keys supported; empty dim side yields empty fact side") {
    import spark.implicits._
    val fact = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val dim = Seq("a", "c").toDF("k")
    val pre = Prefilter.bloomSemiJoin(fact, dim, "k", "k")
    val kept = pre.select("k").collect().map(_.getString(0)).toSet
    assert(Set("a", "c").subsetOf(kept)) // fpp may admit "b", never drop a/c
    val none = Prefilter.bloomSemiJoin(fact, dim.filter(lit(false)), "k", "k")
    assert(none.count() == 0)
  }

  test("mismatched key sketch classes fail fast instead of silently pruning everything") {
    import spark.implicits._
    // string fact key probed against a long-built filter would hash
    // disjoint bit sets — near-zero survivors, bit-identity broken
    val fact = Seq(("1", 1), ("2", 2)).toDF("k", "v")
    val dim = Seq(1L, 2L).toDF("k")
    intercept[IllegalArgumentException] {
      Prefilter.bloomSemiJoin(fact, dim, "k", "k")
    }
    intercept[IllegalArgumentException] { // unsupported type, either side
      Prefilter.bloomSemiJoin(Seq(1.5).toDF("k"), dim, "k", "k")
    }
  }
}
