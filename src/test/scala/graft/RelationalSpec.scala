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

  test("e04 sliding windows floor (not truncate) pre-1970 timestamps") {
    import spark.implicits._
    val slide = 900000000000L
    val dir = java.nio.file.Files.createTempDirectory("e04neg").toString
    val events = Seq(
      (1L, -100L, 10L, "click", 1.0, "{}"),          // just before epoch
      (2L, -slide - 1L, 11L, "view", 2.0, "{}"),
      (3L, 100L, 12L, "click", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.parquet(s"$dir/events.parquet")
    val got = queries.Pipeline.e04Sliding(spark, dir)
      .select("win_start", "event_type", "cnt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // both Spark `div` and DuckDB integer `//` truncate toward zero; the
    // query and its oracle floor explicitly — for ts = -100 the window
    // base must be -slide, not 0 (streaming window() semantics)
    val expected = Seq((-100L, "click"), (-slide - 1L, "view"), (100L, "click"))
      .flatMap { case (ts, et) =>
        val base = Math.floorDiv(ts, slide) * slide
        (0L to 3L).map(k => (base - k * slide, et))
      }.groupBy(identity).map { case ((w, et), v) => (w, et, v.size.toLong) }.toSet
    assert(got == expected, s"only-got=${(got -- expected).take(4)} only-exp=${(expected -- got).take(4)}")
  }

  test("e10 spike baseline is a RANGE frame: calendar gaps count as zero traffic") {
    import spark.implicits._
    val hourNs = 3600000000000L
    val dir = java.nio.file.Files.createTempDirectory("e10gap").toString
    // hours 0..23: 8 events each; hours 24..46 silent; hour 47: 5 events.
    // RANGE(24 PRECEDING, 1 PRECEDING) at hour 47 sees only hour 23
    // (baseline 8) → 5·24 > 8·2 → SPIKE. A ROWS frame would reach back
    // to hours 0..23 (baseline 192) and call it quiet — the exact bug
    // the RANGE spelling exists to avoid.
    val rows = (for (h <- 0 until 24; i <- 0 until 8)
      yield (h.toLong * 8 + i, h * hourNs + i * 1000L, 1L, "click", 1.0, "{}")) ++
      (0 until 5).map(i => (900L + i, 47 * hourNs + i * 1000L, 1L, "click", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = queries.Pipeline.e10SpikeDetection(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // warm-up rows (hour < 24) are excluded; the silent hours have no
    // count rows; so exactly one output row remains
    assert(got.toSeq == Seq(("click", 47L, 5L, 8L, 1L)),
      s"expected the single post-gap spike row, got ${got.toSeq}")
  }

  test("q20 session_window merges events exactly gap apart (oracle must use diff > gap)") {
    import spark.implicits._
    val gapNs = 1800L * 1000 * 1000 * 1000 // 30 min, the q20 gap
    val t0 = 1_000_000_000_000_000L        // µs-aligned epoch-nanos base
    val dir = java.nio.file.Files.createTempDirectory("q20gap").toString
    Seq(
      // exactly gap apart: the new event starts AT the session's end —
      // session_window merges (UpdatingSessionsIterator splits only on
      // start strictly greater than current end), so ONE session
      (1L, t0, 10L, "click", 1.0, "{}"),
      (2L, t0 + gapNs, 10L, "click", 2.0, "{}"),
      // one µs past the gap: TWO sessions
      (3L, t0, 20L, "view", 3.0, "{}"),
      (4L, t0 + gapNs + 1000L, 20L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = queries.Relational.q20SessionWindows(spark, dir)
      .select("user_id", "sess_start_us", "sess_end_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val gapUs = gapNs / 1000
    assert(got == Set(
      (10L, t0 / 1000, t0 / 1000 + 2 * gapUs, 2L),
      (20L, t0 / 1000, t0 / 1000 + gapUs, 1L),
      (20L, t0 / 1000 + gapUs + 1, t0 / 1000 + 2 * gapUs + 1, 1L)
    ), s"got $got")
  }

  test("q49 money rounding-tie: decimal-domain charge rounds the exact tie UP on both engines") {
    // The r12 q49 red: ext=1.15, disc=0.05, tax=0.02 has EXACT charge
    // 1.15·0.95·1.02 = 1.114350 — a genuine .00005 scale-4 tie. The
    // decimal-domain convention rounds the exact value HALF_UP → 1.1144,
    // and DuckDB's round(sum, 4) replays the same (pinned by the literal
    // below). The old double-product→DECIMAL(18,4) spelling FAILS this
    // spec: the double is 1.1143499999999997, whose shortest-string
    // HALF_UP is 1.1143.
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("q49tie").toString
    Seq((1L, 1L, 1L, 1, 1.0, 1.15, 0.05, 0.02, "N", "O",
        Timestamp.valueOf("1997-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val row = queries.Relational.q49PricingSummary(spark, dir).collect()
    assert(row.length == 1)
    val r = row.head
    // DuckDB-replayed literals: exact decimal arithmetic, round(·,4)
    assert(r.getAs[Double]("sum_charge") == 1.1144,
      s"sum_charge ${r.getAs[Double]("sum_charge")} != 1.1144 (exact 1.114350 must round HALF_UP)")
    assert(r.getAs[Double]("sum_disc_price") == 1.0925,
      s"sum_disc_price ${r.getAs[Double]("sum_disc_price")} != exact 1.15*0.95")
    // and the boundary fact itself stays true (guards fixture relevance)
    assert(1.15 * (1.0 - 0.05) * (1.0 + 0.02) == 1.1143499999999997)
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
