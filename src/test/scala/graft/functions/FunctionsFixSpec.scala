package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Regression specs for the round-1 ADVICE findings in graft.functions. */
class FunctionsFixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("nanosToTs is exact integer floor division (ADVICE r1: double rounding at ~1.7e18)") {
    import spark.implicits._
    // epoch-nano longs exceed double's 2^53 exact range; sweep a window
    // where double division is off by 1µs for some residues
    val base = 1700000000000000000L
    val nanos = (0 until 4096).map(i => base + i) ++ (0 until 64).map(i => base + i * 1000L)
    val got = nanos.toDF("n")
      .select($"n", unix_micros(Cols.nanosToTs($"n")).as("us"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, us) =>
      assert(us == n / 1000L, s"nanos $n -> $us, expected ${n / 1000L}")
    }
  }

  test("nanosToTs floors negative (pre-1970) nanos instead of truncating (ADVICE r2)") {
    import spark.implicits._
    val nanos = Seq(-1L, -999L, -1000L, -1001L, -1999L, -2000L,
      -1700000000000000001L, -1700000000000000999L, 0L, 1L, 999L)
    val got = nanos.toDF("n")
      .select($"n", unix_micros(Cols.nanosToTs($"n")).as("us"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, us) =>
      val floor = Math.floorDiv(n, 1000L)
      assert(us == floor, s"nanos $n -> $us, expected floor $floor")
    }
  }

  test("registered graft functions are callable from SQL text") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_fingerprint('a b c d', 3) AS fp, graft_simhash('a b c') AS sh, " +
      "size(graft_shingles('a b c d', 3)) AS n, graft_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d")
      .head
    assert(r.getString(0).length == 32)
    assert(r.getInt(2) == 2)
    assert(math.abs(r.getDouble(3) - 11.0) < 1e-12)
  }

  test("ensureRegistered keys on the session registry, not an identity hash (ADVICE r1)") {
    val s1 = spark
    val s2 = spark.newSession() // fresh sessionState => fresh FunctionRegistry
    GraftFunctions.ensureRegistered(s1)
    GraftFunctions.ensureRegistered(s1) // idempotent on the same session
    GraftFunctions.ensureRegistered(s2)
    for (s <- Seq(s1, s2)) {
      import s.implicits._
      val d = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
        .select(GraftFunctions.graftDot($"a", $"b").as("d"))
        .head.getDouble(0)
      assert(math.abs(d - 11.0) < 1e-12)
    }
  }
}
