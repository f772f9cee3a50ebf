package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contracts for the edit-distance matching family. The load-bearing
  * pin is COMPLETENESS: [[Fuzzy.fuzzyJoin]]'s three filters (length,
  * count, rare-gram prefix) must prune candidates, never pairs — so
  * the filtered join is compared pair-for-pair against the band-join
  * twin on an adversarial fixture (tiny alphabet → heavy gram
  * collisions and repeated grams; lengths 0..14 straddling the
  * short-string routing boundary q*d+q-1).
  */
class FuzzySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Deterministic adversarial fixture: strings over {a,b,c,' '} of
    * length 0-14, seeded corruptions of a base pool so that near pairs
    * at every distance 0..3 exist, plus empties and sub-q-length runts.
    */
  private lazy val fixture = {
    val rnd = new scala.util.Random(42)
    val alpha = "abc "
    def randStr(len: Int): String =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val base = (0 until 60).map(_ => randStr(3 + rnd.nextInt(12)))
    val corrupted = base.flatMap { s =>
      val del = if (s.nonEmpty) { val p = rnd.nextInt(s.length); s.take(p) + s.drop(p + 1) } else s
      val sub = if (s.nonEmpty) { val p = rnd.nextInt(s.length); s.updated(p, alpha(rnd.nextInt(alpha.length))) } else s
      val ins = { val p = rnd.nextInt(s.length + 1); s.take(p) + alpha(rnd.nextInt(alpha.length)) + s.drop(p) }
      Seq(del, sub, ins)
    }
    val runts = Seq("", "a", "b", "ab", "ba", "abc", "ab c", "", "c")
    (base ++ corrupted ++ runts).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "s")
  }

  private def pairSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("fuzzyJoin == band-join twin pair-for-pair (completeness of all three filters)") {
    val left = df(fixture.filter(_._1 % 2 == 0))
    val right = df(fixture.filter(_._1 % 2 == 1))
    for (d <- Seq(1, 2)) {
      val filtered = pairSet(Fuzzy.fuzzyJoin(left, right, maxDist = d))
      val naive = pairSet(Fuzzy.fuzzyJoinBand(left, right, maxDist = d))
      assert(naive.nonEmpty, "fixture produced no near pairs — not exercising anything")
      val lost = naive -- filtered
      assert(lost.isEmpty, s"prefix filter LOST pairs at d=$d: ${lost.take(5)}")
      val phantom = filtered -- naive
      assert(phantom.isEmpty, s"filtered path invented pairs at d=$d: ${phantom.take(5)}")
    }
  }

  test("q=3 grams: completeness holds at a different gram width") {
    val left = df(fixture.filter(_._1 % 3 == 0))
    val right = df(fixture.filter(_._1 % 3 != 0))
    val filtered = pairSet(Fuzzy.fuzzyJoin(left, right, maxDist = 2, q = 3))
    val naive = pairSet(Fuzzy.fuzzyJoinBand(left, right, maxDist = 2))
    assert(filtered == naive, s"q=3 mismatch: lost=${(naive -- filtered).size} phantom=${(filtered -- naive).size}")
  }

  test("maxDist=0 degenerates to an exact equi-join; empty strings pair at distance 0") {
    val left = df(Seq((1L, "abc"), (2L, ""), (3L, "xyz")))
    val right = df(Seq((10L, "abc"), (20L, ""), (30L, "abd")))
    val got = pairSet(Fuzzy.fuzzyJoin(left, right, maxDist = 0))
    assert(got == Set((1L, 10L, 0), (2L, 20L, 0)))
    // and at d=1 the empty string pairs with 1-char strings via the
    // short path (zero shared grams — the count bound is vacuous)
    val d1 = pairSet(Fuzzy.fuzzyJoin(df(Seq((1L, ""))), df(Seq((2L, "a"), (3L, "ab"))), maxDist = 1))
    assert(d1 == Set((1L, 2L, 1)))
  }

  test("entityMatch: min distance wins, ties break by catalog id, n_candidates counts the pool") {
    val dirty = df(Seq((1L, "abcb")))
    val catalog = df(Seq((7L, "abcb"), (9L, "abcc"), (5L, "abcd"), (3L, "zzzz")))
    val rows = Fuzzy.entityMatch(dirty, catalog, maxDist = 2).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 7L && r.getInt(2) == 0,
      s"expected exact match to 7, got $r")
    assert(r.getLong(3) == 3L, s"n_candidates should count all 3 within d=2, got ${r.getLong(3)}")
    // knock out the exact match: 5 and 9 tie at distance 1 → smaller id
    val rows2 = Fuzzy.entityMatch(dirty, df(Seq((9L, "abcc"), (5L, "abca"))), maxDist = 2).collect()
    assert(rows2.head.getLong(1) == 5L, s"tie must break to smaller catalog id, got ${rows2.head}")
  }

  test("plan: fuzzyJoin builds no cartesian/nested-loop join at any stage") {
    val left = df(fixture.take(40))
    val right = df(fixture.drop(40))
    val plan = Fuzzy.fuzzyJoin(left, right, maxDist = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in fuzzyJoin plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in fuzzyJoin plan")
  }

  test("catalog index lifecycle: serve == from-scratch, update == rebuild, forget == rebuild-minus, loud without sidecar") {
    val root = java.nio.file.Files.createTempDirectory("graft_fuzzy_idx")
      .toFile.getAbsolutePath
    val live = s"$root/catalog"
    val catalog = df(fixture.filter(_._1 % 2 == 1))
    val dirty = df(fixture.filter(_._1 % 2 == 0))
    Fuzzy.writeCatalogIndex(catalog, live, maxDist = 2)
    assert(Fuzzy.readCatalogIndexParams(spark, live).contains(Fuzzy.FuzzyIndexParams(2, 2)))
    assert(pairSet(Fuzzy.fuzzyJoinIndexed(spark, dirty, live))
      == pairSet(Fuzzy.fuzzyJoin(dirty, catalog, maxDist = 2)),
      "indexed serve != from-scratch join on the same catalog")

    // upsert: new entries (copies of dirty strings → guaranteed fresh
    // matches) + one RE-INGESTED id whose content changed (its old
    // string's pairs must vanish — stale-row drop)
    val changedId = fixture.filter(_._1 % 2 == 1).head._1
    val batch = df(dirty.collect().take(5).zipWithIndex
      .map { case (r, i) => (10000L + i, r.getString(1)) }
      .toSeq :+ (changedId, "zzzzzzzzzz"))
    val grown = catalog.filter(col("id") =!= changedId).unionByName(batch)
    Fuzzy.updateCatalogIndex(spark, batch, live)
    assert(pairSet(Fuzzy.fuzzyJoinIndexed(spark, dirty, live))
      == pairSet(Fuzzy.fuzzyJoin(dirty, grown, maxDist = 2)),
      "update(index, batch) != rebuild over the grown catalog")

    // takedown: forgotten ids leave the pair set entirely
    import spark.implicits._
    val gone = Seq(10000L, 10001L, changedId).toDF("id")
    Fuzzy.forgetCatalogIndex(spark, live, gone)
    val afterForget = grown.join(gone, Seq("id"), "left_anti")
    assert(pairSet(Fuzzy.fuzzyJoinIndexed(spark, dirty, live))
      == pairSet(Fuzzy.fuzzyJoin(dirty, afterForget, maxDist = 2)),
      "forget(index, ids) != rebuild over the surviving catalog")

    // not-an-index paths fail loudly, never serve garbage
    intercept[IllegalArgumentException] {
      Fuzzy.fuzzyJoinIndexed(spark, dirty, s"$root/nope")
    }
    intercept[IllegalArgumentException] {
      Fuzzy.updateCatalogIndex(spark, batch, s"$root/nope")
    }
  }

  test("streaming entity match across a catalog swap: stream == batch on both sides") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_fuzzy_stream")
      .toFile.getAbsolutePath
    val live = s"$root/catalog"
    val catalogV1 = df(fixture.filter(_._1 % 2 == 1))
    val dirty1 = fixture.filter(t => t._1 % 2 == 0 && t._1 < 60)
    Fuzzy.writeCatalogIndex(catalogV1, live, maxDist = 2)
    def matchRows(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "match_id", "dist", "n_candidates").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val expectedV1 = matchRows(Fuzzy.entityMatch(df(dirty1), catalogV1, maxDist = 2))
    assert(expectedV1.nonEmpty, "fixture batch 1 matches nothing — weak test")
    val input = MemoryStream[(Long, String)]
    val served = graft.streaming.StreamingFuzzy.startAt(
      input.toDF().toDF("id", "s"), live, s"$root/out", s"$root/ckpt")
    try {
      input.addData(dirty1)
      served.processAllAvailable()
      // catalog grows; upsert + swap lands BETWEEN micro-batches
      val batch = df(dirty1.take(4).zipWithIndex
        .map { case ((_, s), i) => (20000L + i, s) })
      Fuzzy.updateCatalogIndex(spark, batch, live)
      input.addData(dirty1.map { case (id, s) => (id + 1000L, s) })
      served.processAllAvailable()
    } finally served.stop()
    val out = spark.read.parquet(s"$root/out")
    assert(matchRows(out.filter(col("id_a") < 1000L)) == expectedV1,
      "pre-swap stream output drifted from the batch operator")
    val catalogV2 = catalogV1.unionByName(
      df(dirty1.take(4).zipWithIndex.map { case ((_, s), i) => (20000L + i, s) }))
    val expectedV2 = matchRows(Fuzzy.entityMatch(
      df(dirty1.map { case (id, s) => (id + 1000L, s) }), catalogV2, maxDist = 2))
    assert(matchRows(out.filter(col("id_a") >= 1000L)) == expectedV2,
      "post-swap stream output drifted from the batch operator on the grown catalog")
    // the swap really changed answers: the upserted exact copies give
    // distance-0 matches that V1 could not
    assert(expectedV2.exists(_._2 >= 20000L),
      "post-swap matches never surface the upserted catalog entries — weak fixture")
  }
}
