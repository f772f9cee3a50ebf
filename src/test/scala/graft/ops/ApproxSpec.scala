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

  test("CMS: one-sided est >= exact for every key; merge == whole-corpus sketch; state bounded") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "").cache()
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = toks.select("token").distinct()
    // THE CMS guarantee: never under (collisions only ever add)
    val sketch = Approx.cmsSketch(toks, "token", depth = 4, width = 256)
    val est = Approx.cmsEstimate(sketch, keys, "token", depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: CMS underestimates (${est(t)} < $c)")
    }
    // state bound: at most depth*width cells regardless of corpus size
    assert(sketch.count() <= 4L * 256)
    // mergeability: cell-wise sum of two half-corpus sketches == the
    // whole-corpus sketch, cell for cell (counters are sums)
    val a = toks.filter(length(col("token")) % 2 === 0)
    val b = toks.filter(length(col("token")) % 2 =!= 0)
    val merged = Approx.cmsMerge(
      Approx.cmsSketch(a, "token", depth = 4, width = 256),
      Approx.cmsSketch(b, "token", depth = 4, width = 256))
    assert(merged.exceptAll(sketch).isEmpty && sketch.exceptAll(merged).isEmpty,
      "merged half-sketches differ from the whole-corpus sketch")
    // a "sketch" bigger than 4M cells fails loudly, not silently
    intercept[IllegalArgumentException] {
      Approx.cmsSketch(toks, "token", depth = 64, width = 1 << 20)
    }
    toks.unpersist()
  }

  test("KMV distinct estimate lands within 3/sqrt(k) of the exact count") {
    import spark.implicits._
    val k = 256
    val vals = (0 until 5000).map(i => s"value_$i").toDF("v")
    val sk = Approx.kmvSketch(vals, col("v"), k)
    val est = Approx.kmvOverlap(sk, sk, k).head.getLong(0)
    val relErr = math.abs(est - 5000).toDouble / 5000
    assert(relErr <= 3.0 / math.sqrt(k),
      f"KMV rel err $relErr%.3f (est $est vs exact 5000, bound ${3.0 / math.sqrt(k)}%.3f)")
  }

  test("KMV is exact below k, and identical sets give jaccard 1.0 with intersection == union") {
    import spark.implicits._
    val k = 128
    val vals = (0 until 50).map(i => s"v$i").toDF("v")
    val sk = Approx.kmvSketch(vals, col("v"), k)
    val r = Approx.kmvOverlap(sk, sk, k).head
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L && r.getLong(2) == 50L,
      s"sub-k sets must estimate exactly: $r")
    assert(r.getLong(3) == 1000000L, s"identical sets must give jaccard micro 1e6: $r")
    assert(r.getLong(4) == r.getLong(2), s"intersection must equal union for identical sets: $r")
  }

  test("KMV: disjoint sets estimate jaccard 0; merged sketch == sketch of the union (mergeability)") {
    import spark.implicits._
    val k = 64
    val a = (0 until 800).map(i => s"a$i").toDF("v")
    val b = (0 until 800).map(i => s"b$i").toDF("v")
    val skA = Approx.kmvSketch(a, col("v"), k)
    val skB = Approx.kmvSketch(b, col("v"), k)
    val r = Approx.kmvOverlap(skA, skB, k).head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L, s"disjoint sets must give jaccard 0: $r")
    // mergeability — the 100 TB property: shard sketches combine
    // without rescanning. k smallest of (skA ∪ skB) == sketch of a ∪ b.
    val mergedFromSketches = skA.unionByName(skB).distinct()
      .orderBy(col("h")).limit(k).collect().map(_.getLong(0)).toSeq
    val fromScratch = Approx.kmvSketch(a.unionByName(b), col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    assert(mergedFromSketches == fromScratch, "sketch merge != union rescan")
  }

  test("KMV sketch plan: TakeOrdered (per-partition heaps), never a global sort") {
    import spark.implicits._
    val vals = (0 until 2000).map(i => s"v$i").toDF("v")
    val plan = Approx.kmvSketch(vals, col("v"), 128)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"kmvSketch must plan as TakeOrdered, got:\n$plan")
    // no full Sort node anywhere: the k smallest must come from heaps,
    // not a corpus-wide ordering
    assert(!plan.contains("Sort ["), s"global sort in kmvSketch plan:\n$plan")
  }

  test("histogram quantiles: exact percentile_disc inside every bracket; merge == whole-corpus; clamps; loud >4M") {
    val docs = Tables.documents(spark, sf).cache()
    val fractions = Seq(0L, 250000L, 500000L, 750000L, 900000L, 990000L, 1000000L)
    val sketch = Approx.histSketch(docs, col("n_chars"), lo = 0L, hi = 640L, buckets = 64)
    val qs = Approx.histQuantiles(sketch, fractions, lo = 0L, hi = 640L, buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    // THE bracket guarantee: the true percentile_disc of the (in-range)
    // values lies inside [q_lo, q_hi] for every fraction — one-bin-width
    // error by construction
    fractions.foreach { f =>
      val exact = docs.agg(
        expr(s"CAST(percentile(n_chars, ${f / 1e6}, 1) AS BIGINT)")).head.getLong(0)
      val (qlo, qhi) = qs(f)
      // percentile() interpolates; disc rank semantics put the value in
      // the bracket — allow the interpolated value the same one-bin slack
      assert(exact >= qlo - 10 && exact <= qhi + 10,
        s"f=$f: exact percentile $exact outside bracket [$qlo, $qhi]")
    }
    // state bound: at most `buckets` cells regardless of corpus size
    assert(sketch.count() <= 64L)
    // mergeability: cell-wise sum of two half-corpus sketches == the
    // whole-corpus sketch, cell for cell (counters are sums)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = Approx.histMerge(
      Approx.histSketch(a, col("n_chars"), 0L, 640L, 64),
      Approx.histSketch(b, col("n_chars"), 0L, 640L, 64))
    assert(merged.exceptAll(sketch).isEmpty && sketch.exceptAll(merged).isEmpty,
      "merged half-sketches differ from the whole-corpus sketch")
    // out-of-range values clamp into the edge bins, never drop: the
    // sketch total always equals the row count
    val spiked = docs.select((col("n_chars") * 100 - 5000).as("v"))
    val clamped = Approx.histSketch(spiked, col("v"), 0L, 640L, 64)
    assert(clamped.agg(sum("cnt")).head.getLong(0) == docs.count(),
      "clamped sketch lost rows")
    val cells = clamped.collect().map(r => r.getInt(0)).toSet
    assert(cells.contains(0) && cells.contains(63), s"edge bins not hit: $cells")
    // a "sketch" bigger than 4M cells fails loudly, not silently
    intercept[IllegalArgumentException] {
      Approx.histSketch(docs, col("n_chars"), 0L, 640L, buckets = 1 << 23)
    }
    docs.unpersist()
  }

  test("histogram bucket: wide domains stay inside [0, buckets) (integral div, not rounded /)") {
    // r12 ADVICE: with decimal `/` + floor, Spark's HALF_UP rounding at
    // result scale 6 pushed values just below a bin edge UP one bin for
    // hi−lo ≳ 2e6, and for hi−lo ≥ 2e6·buckets a value near hi yielded
    // bucket == buckets — outside the clamp contract. These two rows
    // fail under the old spelling and pin the `div` one.
    import spark.implicits._
    val wide = Seq(3999999999L, 1999999L, 0L, 3999999999L - 1).toDF("v")
    val sk = Approx.histSketch(wide, col("v"), lo = 0L, hi = 4000000000L, buckets = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sk.keySet.forall(b => b >= 0 && b < 2), s"bucket out of range: $sk")
    assert(sk(0) == 2 && sk(1) == 2, s"wrong bin split: $sk") // 0,1999999 → 0; the two near-hi → 1
    // edge case: value one below a bin edge of a ≥2e6-wide domain stays
    // in the LOWER bin (the old spelling rounded it up)
    val edge = Seq(1999999L).toDF("v")
    val one = Approx.histSketch(edge, col("v"), 0L, 4000000L, 2).collect()
    assert(one.length == 1 && one.head.getInt(0) == 0,
      s"value below the bin edge escaped its bin: ${one.mkString}")
  }

  test("per-key histogram quantiles: every group's bracket holds; grouped merge == whole corpus") {
    val docs = Tables.documents(spark, sf).cache()
    val sketch = Approx.histSketchBy(docs, "source", col("n_chars"), 0L, 640L, 64)
    val qs = Approx.histQuantilesBy(sketch, Seq(500000L, 990000L), 0L, 640L, 64)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(4), r.getLong(5))).toMap
    // bracket guarantee holds PER GROUP
    val exact = docs.groupBy(col("source"))
      .agg(expr("CAST(percentile(n_chars, 0.5, 1) AS BIGINT)").as("p50"),
        expr("CAST(percentile(n_chars, 0.99, 1) AS BIGINT)").as("p99"))
      .collect()
    exact.foreach { r =>
      val src = r.getString(0)
      Seq((500000L, r.getLong(1)), (990000L, r.getLong(2))).foreach { case (f, ex) =>
        val (qlo, qhi) = qs((src, f))
        assert(ex >= qlo - 10 && ex <= qhi + 10,
          s"$src f=$f: exact $ex outside bracket [$qlo, $qhi]")
      }
    }
    // every key answered for every fraction
    val nKeys = docs.select("source").distinct().count()
    assert(qs.size == nKeys * 2, s"${qs.size} brackets for $nKeys keys")
    // grouped cell-wise merge == whole-corpus grouped sketch
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = Approx.histMergeBy(
      Approx.histSketchBy(a, "source", col("n_chars"), 0L, 640L, 64),
      Approx.histSketchBy(b, "source", col("n_chars"), 0L, 640L, 64))
    assert(merged.exceptAll(sketch).isEmpty && sketch.exceptAll(merged).isEmpty,
      "grouped merge differs from the whole-corpus sketch")
    docs.unpersist()
  }

  test("per-key KMV: exact below k, banded above, per-key merge == union rescan, plans via TopKPerKey") {
    import spark.implicits._
    val k = 64
    // key "small" holds 40 distinct (< k, exact); "big" holds 4000 (> k, estimated)
    val vals = ((0 until 40).map(i => ("small", s"s$i")) ++
      (0 until 4000).map(i => ("big", s"b$i"))).toDF("grp", "v")
    val sk = Approx.kmvSketchBy(vals, "grp", col("v"), k)
    val est = Approx.kmvDistinctBy(sk, k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est("small") == ((40L, 40L)), s"sub-k key must be exact: ${est("small")}")
    assert(est("big")._1 == k.toLong, s"sketch must hold k rows: ${est("big")}")
    val relErr = math.abs(est("big")._2 - 4000).toDouble / 4000
    assert(relErr <= 3.0 / math.sqrt(k),
      f"per-key KMV rel err $relErr%.3f (est ${est("big")._2} vs 4000)")
    // per-key mergeability: each key's k smallest of two half-sketches
    // == that key's sketch of the union
    val a = vals.filter(length(col("v")) % 2 === 0)
    val b = vals.filter(length(col("v")) % 2 =!= 0)
    val merged = Approx.kmvMergeBy(k,
      Approx.kmvSketchBy(a, "grp", col("v"), k),
      Approx.kmvSketchBy(b, "grp", col("v"), k))
    assert(merged.exceptAll(sk).isEmpty && sk.exceptAll(merged).isEmpty,
      "per-key sketch merge != union rescan")
    // the truncation is the custom operator, not window machinery
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"per-key truncation lost the custom op:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      s"window machinery crept into the per-key sketch:\n$plan")
  }

  test("KMV jaccard estimate tracks the true overlap within the sketch error band") {
    import spark.implicits._
    val k = 256
    // |A|=3000, |B|=3000, |A∩B|=1500 → true J = 1500/4500 = 1/3
    val a = (0 until 3000).map(i => s"x$i").toDF("v")
    val b = (1500 until 4500).map(i => s"x$i").toDF("v")
    val r = Approx.kmvOverlap(
      Approx.kmvSketch(a, col("v"), k), Approx.kmvSketch(b, col("v"), k), k).head
    val j = r.getLong(3) / 1e6
    assert(math.abs(j - 1.0 / 3.0) <= 0.12, s"jaccard est $j too far from 1/3")
    val inter = r.getLong(4)
    assert(math.abs(inter - 1500).toDouble / 1500 <= 0.25,
      s"intersection est $inter too far from 1500")
  }
}
