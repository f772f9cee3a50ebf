package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("interleave is the standard Morton code") {
    assert(ZOrder.interleave(Array(1, 0), 2) == 1L) // x bit0 -> pos 0
    assert(ZOrder.interleave(Array(0, 1), 2) == 2L) // y bit0 -> pos 1
    assert(ZOrder.interleave(Array(3, 3), 2) == 15L)
    // x=2 (bit1 -> pos 2), y=1 (bit0 -> pos 1) -> 0b110
    assert(ZOrder.interleave(Array(2, 1), 2) == 6L)
    assert(ZOrder.interleave(Array(5, 2, 7), 3) ==
      ((1L << 0) + (1L << 6)       // x=5: bits 0,2 -> pos 0, 6
       + (1L << 4)                 // y=2: bit 1 -> pos 4
       + (1L << 2) + (1L << 5) + (1L << 8))) // z=7: bits 0,1,2 -> 2,5,8
  }

  test("rankOf counts boundaries <= v") {
    val b = Array(10.0, 20.0, 30.0)
    assert(ZOrder.rankOf(b, 5.0) == 0)
    assert(ZOrder.rankOf(b, 10.0) == 1)
    assert(ZOrder.rankOf(b, 25.0) == 2)
    assert(ZOrder.rankOf(b, 35.0) == 3)
  }

  test("z-ordered layout prunes on BOTH columns; single-column sort on one") {
    import spark.implicits._
    val n = 4096
    val df = (0 until n).map(i => (i % 64, i / 64)).toDF("x", "y") // 64x64 grid
    val parts = 16
    val zed = ZOrder.layoutBy(df, Seq("x", "y"), parts, bits = 6).cache()
    val linear = df.repartitionByRange(parts, col("x"))
      .sortWithinPartitions("x").cache()
    try {
      assert(zed.count() == n, "layout lost rows")
      val zx = ZOrder.partitionSpanFraction(zed, "x")
      val zy = ZOrder.partitionSpanFraction(zed, "y")
      val lx = ZOrder.partitionSpanFraction(linear, "x")
      val ly = ZOrder.partitionSpanFraction(linear, "y")
      // sanity: the single-column sort is sharp on its own column and
      // useless on the other
      assert(lx < 0.2, s"linear layout should prune x, got $lx")
      assert(ly > 0.8, s"linear layout cannot prune y, got $ly")
      // z-order: BOTH columns' per-partition spans are a fraction of the
      // global range (16 partitions on a 64x64 grid -> ~1/4 per axis)
      assert(zx < 0.5, s"z-order failed to prune x: $zx")
      assert(zy < 0.5, s"z-order failed to prune y: $zy")
    } finally { zed.unpersist(); linear.unpersist(); () }
  }

  test("z-ordered parquet files actually skip row groups for a probe-column predicate") {
    import spark.implicits._
    // 64x64 grid, 16 rows per cell: 16 output files of one row group each,
    // so parquet min/max stats skipping operates at file granularity
    val n = 65536
    val df = (0 until n).map(i => (i % 64, (i / 64) % 64)).toDF("x", "y")
    val dir = "file:" + java.nio.file.Files.createTempDirectory("zorder_prune").toString
    ZOrder.layoutBy(df, Seq("x", "y"), numPartitions = 16, bits = 6)
      .write.parquet(s"$dir/zed")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")
    // rows the parquet reader actually produced (post row-group/page
    // skipping, pre Spark-side filter) — the scan leaf's numOutputRows
    def rowsRead(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("y") >= 10 && col("y") <= 20)
      assert(q.count() == 11L * 64 * 16, "box result wrong - fixture broken")
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(sys.error("no FileSourceScanExec leaf in plan"))
      scan.metrics("numOutputRows").value
    }
    val lin = rowsRead(s"$dir/linear")
    val zed = rowsRead(s"$dir/zed")
    // x-sorted files all span the full y range: a y predicate skips nothing
    assert(lin > (0.9 * n).toLong, s"x-sorted layout unexpectedly skipped rows ($lin of $n)")
    // z-ordered files cover ~16x16 rectangles: only the two y-bands
    // overlapping [10,20] survive the row-group stats filter
    assert(zed <= (0.7 * lin).toLong,
      s"z-order produced no real parquet skipping: read $zed rows vs $lin unsorted")
  }

  test("doAutoCoalesce with zorderCols compacts and clusters in one rewrite") {
    import spark.implicits._
    implicit val s = spark
    // 64x64 grid with a payload column fat enough that the compaction
    // plan wants several output files at a 1 MB target
    val n = 65536
    // per-row distinct pad so parquet can't dictionary/RLE it away —
    // the on-disk size must be real for the size-based plan to fan out
    def pad(i: Int) = (0 until 30)
      .map(j => java.lang.Long.toHexString((i * 31L + j) * 2654435761L)).mkString
    val df = (0 until n).map(i => (i % 64, (i / 64) % 64, pad(i))).toDF("x", "y", "pad")
    val dir = "file:" + java.nio.file.Files.createTempDirectory("zcompact").toString + "/t"
    df.repartition(32).write.parquet(dir) // fragmented ingest shape
    val got = graft.compact.Compactor.doAutoCoalesce(dir, requestedSizeMb = 1,
      zorderCols = Seq("x", "y"))
    // >= 4 range partitions so the curve's top split bits reach BOTH axes
    assert(got >= 4, s"fixture should want >= 4 output files, got $got")
    val back = spark.read.parquet(dir)
    assert(back.count() == n, "compaction lost rows")
    // round-robin fragments span the whole value space; the z-ordered
    // rewrite's FILES cover compact rectangles on both curve columns
    val fx = ZOrder.fileSpanFraction(back, "x")
    val fy = ZOrder.fileSpanFraction(back, "y")
    assert(fx < 0.7, s"x not clustered after z-compaction: $fx")
    assert(fy < 0.7, s"y not clustered after z-compaction: $fy")
    // plain compaction of the same fragments keeps full-range files
    val dir2 = "file:" + java.nio.file.Files.createTempDirectory("zcompact2").toString + "/t"
    df.repartition(32).write.parquet(dir2)
    assert(graft.compact.Compactor.doAutoCoalesce(dir2, requestedSizeMb = 1) == got)
    val plain = ZOrder.fileSpanFraction(spark.read.parquet(dir2), "y")
    assert(plain > 0.8, s"fixture: plain coalesce should not cluster y ($plain)")
  }

  test("layoutBy survives nulls in z-order columns; degenerate diagnostic returns 0") {
    import spark.implicits._
    val df = Seq[(java.lang.Integer, java.lang.Integer)](
      (1, 10), (2, null), (null, 30), (null, null), (5, 50)
    ).toDF("a", "b")
    val zed = ZOrder.layoutBy(df, Seq("a", "b"), numPartitions = 2, bits = 3)
    assert(zed.count() == 5, "null rows lost or job crashed")
    // nulls rank 0: an all-null row z-codes to 0 and sorts first
    val z = ZOrder.withZValue(df, Seq("a", "b"), bits = 3)
    assert(z.filter(col("a").isNull && col("b").isNull)
      .select("__z").head.getLong(0) == 0L)
    assert(ZOrder.partitionSpanFraction(df.filter(lit(false)), "a") == 0.0)
    assert(ZOrder.partitionSpanFraction(df.filter(col("a").isNull && col("b").isNull), "a") == 0.0)
  }

  test("withZValue is deterministic across reruns") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ((i * 37) % 100, (i * 91) % 100)).toDF("a", "b")
    def zs = ZOrder.withZValue(df, Seq("a", "b"), bits = 5)
      .select("__z").collect().map(_.getLong(0)).toSeq
    assert(zs == zs)
  }

  test("withZValue is a native codegen expression, not a UDF, and matches the reference interleave") {
    import spark.implicits._
    val df = (0 until 500).map(i => ((i * 37) % 100, (i * 91) % 100)).toDF("a", "b")
    val zed = ZOrder.withZValue(df, Seq("a", "b"), bits = 4)
    // the compaction rewrite path must stay inside whole-stage codegen
    val plan = zed.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"Morton code regressed to a UDF:\n$plan")
    // the expression must compute exactly rankOf+interleave: replay each
    // row through the reference Scala implementation at the same bounds
    val nBounds = (1 << 4) - 1
    val probs = (1 to nBounds).map(_.toDouble / (nBounds + 1)).toArray
    val bounds = df.stat.approxQuantile(Array("a", "b"), probs, 0.001)
    zed.collect().foreach { r =>
      val expected = ZOrder.interleave(Array(
        ZOrder.rankOf(bounds(0), r.getInt(0)),
        ZOrder.rankOf(bounds(1), r.getInt(1))), 2)
      assert(r.getAs[Long]("__z") == expected,
        s"native Morton diverged from reference at row $r")
    }
  }
}
