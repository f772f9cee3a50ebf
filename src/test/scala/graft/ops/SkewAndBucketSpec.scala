package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class SkewAndBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("saltedSum equals direct groupBy sum") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
    val direct = li.groupBy("l_returnflag").agg(sum("qty").as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(li.select("l_returnflag", "qty"), Seq("l_returnflag"), "qty")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
  }

  test("saltedJoin equals direct inner join") {
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf).withColumnRenamed("n_nationkey", "c_nationkey")
    val direct = c.join(n, "c_nationkey").groupBy("n_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(c, n, "c_nationkey").groupBy("n_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("joinSkewReport: hand-checked contributions, integer-ceil salt, top-N cut, no fact-row join") {
    import spark.implicits._
    val left = (Seq.fill(3)("a") ++ Seq("b")).toDF("k")
    val right = (Seq.fill(2)("a") ++ Seq.fill(5)("b") ++ Seq.fill(7)("c")).toDF("k")
    val rep = Skew.joinSkewReport(left, right, "k", targetRowsPerTask = 4L, topN = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: 3·2=6 → ceil(6/4)=2; b: 1·5=5 → 2; c only on the right → absent
    assert(rep == Map("a" -> ((3L, 2L, 6L, 2L)), "b" -> ((1L, 5L, 5L, 2L))), rep)
    // topN keeps the largest contributor (ties broken by key)
    val top1 = Skew.joinSkewReport(left, right, "k", targetRowsPerTask = 4L, topN = 1)
      .collect()
    assert(top1.length == 1 && top1(0).getString(0) == "a", top1.mkString(","))
    // scale shape: the fact frames are aggregated BEFORE the join (the
    // join runs at key cardinality) and the cut is a TakeOrdered, not a
    // global sort
    val plan = Skew.joinSkewReport(left, right, "k").queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-N operator:\n$plan")
    val joinIdx = plan.indexOf("Join")
    val aggBelow = plan.substring(joinIdx).contains("HashAggregate")
    assert(joinIdx < 0 || aggBelow, s"join must consume aggregated sides:\n$plan")
  }

  test("adaptiveSaltedJoin == direct join; hot keys spread, cold keys unreplicated") {
    import spark.implicits._
    val large = ((1 to 60).map(i => ("hot", i.toLong)) ++
      (1 to 5).map(i => ("cold", i.toLong))).toDF("k", "v")
    val small = Seq(("hot", 100L), ("hot", 200L), ("cold", 300L),
      ("unmatched", 400L)).toDF("k", "w")
    val report = Skew.joinSkewReport(large, small, "k", targetRowsPerTask = 30L)
    // hot: 60·2=120 → ceil(120/30)=4 buckets; cold: 5·1=5 → 1
    val factors = report.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(factors == Map("hot" -> 4L, "cold" -> 1L), factors)
    val adaptive = Skew.adaptiveSaltedJoin(large, small, "k", report)
      .select("k", "v", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val direct = large.join(small, "k")
      .select("k", "v", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(adaptive.sameElements(direct), "adaptive salting changed join semantics")
    // the hot key actually spreads: its large-side salt takes > 1 value
    val salts = large.join(broadcast(report.select(col("k"),
        col("salt_buckets").cast("long").as("__nb"))), Seq("k"), "left")
      .withColumn("s", pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*),
        coalesce(col("__nb"), lit(1L))))
      .filter(col("k") === "hot").select("s").distinct().count()
    assert(salts > 1, s"hot key never spread: $salts salt value(s)")
    // a report computed on a SAMPLE (missing keys) still joins correctly
    val partial = report.filter(col("k") === "hot")
    val adaptivePartial = Skew.adaptiveSaltedJoin(large, small, "k", partial)
      .select("k", "v", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(adaptivePartial.sameElements(direct), "missing-key default broke the join")
  }

  test("AQE splits a skewed join partition at runtime (the no-salt scale path)") {
    import spark.implicits._
    // manual salting (above) is the explicit skew tool; AQE's skew-join
    // rewrite is the zero-code path a 100 TB job leans on first. Pin
    // that the mechanism actually fires: one hot key dominating the
    // left side must come out of planning marked isSkewJoin.
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // incompressible pad: shuffle-size stats see compressed block
      // sizes, and a constant pad would deflate the "skew" away
      val pad = concat_ws("", md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string")), md5((col("id") + 2).cast("string")))
      val left = spark.range(0, 300000)
        .select((when(col("id") < 250000, 0L).otherwise(pmod(col("id"), lit(997L)) + 1))
          .as("k"), pad.as("pad"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      // aggregate OVER pad so column pruning can't drop it below the
      // join — a bare count would shuffle 8-byte keys and no skew exists
      val joined = left.join(right, "k")
        .select(count(col("pad")).as("n"), sum(length(col("pad"))).as("bytes"))
      // collect through THIS DataFrame's QueryExecution — a separate
      // .count() would execute a different QE and leave this one's
      // adaptive plan unfinalized (isFinalPlan=false, no skew marking)
      assert(joined.collect().head.getLong(0) == 300000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val root = "file:" + Files.createTempDirectory("buckets").toFile.getAbsolutePath
    spark.sql("CREATE DATABASE IF NOT EXISTS bk")
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$root/o").saveAsTable("bk.orders_b")
    c.withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$root/c").saveAsTable("bk.customer_b")
    val joined = spark.table("bk.orders_b").join(spark.table("bk.customer_b"), "o_custkey")
    // co-located bucketed join: no Exchange on either side
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
  }

  test("writeBucketed recovers an orphaned managed-table location (cross-JVM rerun)") {
    val n = Tables.nation(spark, sf)
    Bucketing.writeBucketed(n, "graft_bspec_nation", "n_nationkey", 4)
    // simulate the fresh-JVM state the r10 bug hit: the in-memory
    // catalog forgets the table but its managed directory survives
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_bspec_nation")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    spark.sessionState.catalog.dropTable(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_bspec_nation"),
      ignoreIfNotExists = false, purge = false)
    fs.mkdirs(loc) // orphan dir back in place (dropTable purged it)
    fs.create(new org.apache.hadoop.fs.Path(loc, "junk")).close()
    // without the cleanup this threw LOCATION_ALREADY_EXISTS
    Bucketing.writeBucketed(n, "graft_bspec_nation", "n_nationkey", 4)
    assert(spark.table("graft_bspec_nation").count() == n.count())
    spark.sql("DROP TABLE graft_bspec_nation")
  }

  test("Profiler: nulls, distincts and dtype serialization on a null-bearing frame") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, null, 2.25), (3L, "a", null), (null, "b", 2.25))
      .toDF("id", "s", "v")
    val rows = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    // n_rows counts every row; n_nulls the per-column gaps; n_distinct
    // excludes nulls; doubles serialize through DECIMAL(18,2)
    assert(rows("id") == ((4L, 1L, 3L, "1", "3")))
    assert(rows("s") == ((4L, 1L, 2L, "a", "b")))
    assert(rows("v") == ((4L, 1L, 2L, "1.50", "2.25")))
  }

  test("profileApprox: HLL distincts within 2% of exact on the fixtures; no Expand") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    def byCol(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = byCol(Profiler.profile(orders))
    val approx = byCol(Profiler.profileApprox(orders))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // nulls and min/max are exact in both variants; only the distinct
      // count is estimated — the 2% bound is the advertised error of
      // the default rsd, checked per column on real fixture data
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2))
      assert(a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5))
      val (nd, ndA) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ndA - nd) <= 0.02 * nd + 1,
        s"column $c: approx distinct $ndA vs exact $nd")
    }
    // the scale point: the approx plan aggregates in ONE pass with no
    // Expand node (the exact plan's N+1-stream Expand is its cost)
    val plan = Profiler.profileApprox(orders).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
    assert(Profiler.profile(orders).queryExecution.executedPlan.toString.contains("Expand"))
  }
}
