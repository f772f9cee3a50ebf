package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.compact.Compactor
import graft.meta.Meta
import graft.ops.ZOrder
import graft.promotor.Promotor

/** SURVEY §7.2 as ONE executable slice: the fs, promotion, compaction,
  * relational, and layout surfaces composed the way a production
  * pipeline runs them — partitioned staging table → partition promotion
  * → small-file compaction → Z-order rewrite — with a Q2-shaped
  * aggregate pinned hash-identical at every step (none of these are
  * data transformations; any drift is a bug) and the physical effects
  * (file counts, partition span) asserted alongside.
  */
class EndToEndPipelineSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  val db = "graft_e2e"

  test("promote -> compact -> z-order: query-identical throughout, files/spans improve") {
    val root = "file:" + Files.createTempDirectory("e2e_wh").toFile.getAbsolutePath
    implicit val conf = spark.sessionState.newHadoopConf()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val li = spark.read.parquet(s"${SparkTestSession.sf}/lineitem.parquet")
      .withColumn("l_ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .where("l_ship_month >= '2001-01'") // keep the fixture small
    // staging: the truth, deliberately fragmented (8 small files per
    // partition — the shape a parallel ingest leaves behind)
    li.repartition(8).write.partitionBy("l_ship_month")
      .option("path", s"$root/e2e_src").saveAsTable(s"$db.e2e_src")
    // serving: stale content (zeroed quantities) awaiting promotion
    li.withColumn("l_quantity", lit(0.0)).write.partitionBy("l_ship_month")
      .option("path", s"$root/e2e_trg").saveAsTable(s"$db.e2e_trg")

    // the Q2-shaped oracle: full-row fingerprint of the grouped aggregate.
    // Sums in DECIMAL — exact, so the fingerprint is invariant to the row
    // REORDERING the file-level rewrites below legitimately cause (double
    // sums drift in the last ulp with summation order)
    def q2(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("sum_qty"),
          sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
        .collect().map(_.toString).toIndexedSeq
    val truth = q2(spark.table(s"$db.e2e_src"))
    assert(q2(spark.table(s"$db.e2e_trg")) != truth, "fixture: target must start stale")

    // ---- promotion: every partition, file-level copy with overwrite
    val months = spark.table(s"$db.e2e_src").select("l_ship_month")
      .distinct().collect().map(_.getString(0)).sorted.toIndexedSeq
    assert(months.size >= 3, s"fixture too small: $months")
    val res = Promotor.copyOverwritePartitions(db, "e2e_src", db, "e2e_trg", months)
    assert(res.nonEmpty && res.forall(_.success), s"promotion failed: $res")
    assert(q2(spark.table(s"$db.e2e_trg")) == truth, "promotion changed query results")

    // ---- compaction: each fragmented leaf collapses to one right-sized file
    val trgPath = Meta.getTableLocation(db, "e2e_trg")
    def filesIn(dir: String): Int = {
      val fs = graft.fs.Fs.getFileSystem(conf, dir)
      fs.listStatus(new Path(dir)).count(s => !s.isDirectory &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    }
    val leaves = Compactor.getLowestFoldersPaths(trgPath)
    assert(leaves.size == months.size, s"leaf dirs $leaves != partitions $months")
    val fragmented = leaves.map(filesIn)
    assert(fragmented.forall(_ > 1), s"fixture: partitions not fragmented: $fragmented")
    val compacted = Compactor.doItAll(trgPath, requestedSizeMb = 100)
    assert(compacted.values.forall(_ == 1),
      s"every leaf should compact to 1 file at 100MB target: $compacted")
    assert(leaves.map(filesIn).forall(_ == 1), "compaction left extra files behind")
    Meta.refreshMetadata(db, "e2e_trg")
    assert(q2(spark.table(s"$db.e2e_trg")) == truth, "compaction changed query results")
    // a second pass must recognize the folder is already compact and skip
    assert(Compactor.doItAll(trgPath, requestedSizeMb = 100).values.forall(_ == -1),
      "re-compaction of a compact table should be a no-op")

    // ---- partition pruning: a month predicate must reach the scan as a
    // PartitionFilter (metadata-only pruning — no data files of other
    // months are even listed, the property that keeps a 100 TB
    // month-partitioned table queryable)
    val monthQ = spark.table(s"$db.e2e_trg")
      .where(col("l_ship_month") === months.head)
      .select("l_returnflag", "l_quantity") // exchange-free: leaf stays inspectable
    monthQ.collect()
    val scan = monthQ.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(sys.error("no FileSourceScanExec leaf"))
    assert(scan.partitionFilters.exists(_.toString.contains("l_ship_month")),
      s"month predicate not a partition filter: ${scan.partitionFilters}")
    // post-compaction each partition is exactly one file, so a pruned
    // scan of one month must read exactly one file
    assert(scan.metrics("numFiles").value == 1L,
      s"pruned scan read ${scan.metrics("numFiles").value} files, want 1")

    // ---- layout: z-order the promoted content for multi-column pruning
    val zDir = s"$root/e2e_z"
    val zed = ZOrder.layoutBy(spark.table(s"$db.e2e_trg"),
      Seq("l_orderkey", "l_partkey"), numPartitions = 16).cache()
    try {
      // span measured on the laid-out partitions (one per output file —
      // re-reading the tiny fixture files would coalesce several z-ranges
      // per input split and blur the metric; LayoutSpec gates the actual
      // parquet row-group skipping of the written files)
      val zOrd = ZOrder.partitionSpanFraction(zed, "l_orderkey")
      val zPart = ZOrder.partitionSpanFraction(zed, "l_partkey")
      assert(zOrd < 0.6, s"z-order failed to prune l_orderkey: $zOrd")
      assert(zPart < 0.6, s"z-order failed to prune l_partkey: $zPart")
      val flat = ZOrder.partitionSpanFraction(spark.table(s"$db.e2e_trg"), "l_orderkey")
      assert(flat > 0.8, s"fixture: unordered layout should not prune ($flat)")
      zed.write.parquet(zDir)
      assert(q2(spark.read.parquet(zDir)) == truth, "z-order rewrite changed query results")
    } finally { zed.unpersist(); () }
  }
}
