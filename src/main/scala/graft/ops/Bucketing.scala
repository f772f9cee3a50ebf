package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the zero-shuffle equi-join.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is the shuffle
  * of BOTH sides onto the join key. When the same join runs repeatedly
  * (a daily orders⋈customer rollup, a fact-to-fact bridge), the
  * scale-correct layout is to PRE-BUCKET both tables on the key at
  * write time: `DataFrameWriter.bucketBy(n, key).sortBy(key)` records
  * the hash-partitioned layout in the catalog, and every subsequent
  * join on that key reads both sides already co-partitioned — the plan
  * has NO Exchange on either join input (pinned in PlanSpec). One
  * write-time shuffle is amortized over every later join/aggregation
  * on the key; Spark's bucket pruning also skips non-matching buckets
  * for point predicates on the bucket column.
  *
  * Bucket count at scale: aim for per-bucket data ≤ a task's worth
  * (128-256 MB compressed) — e.g. 100 TB / 200 MB ≈ 500k is too many
  * buckets for small dims, so bucket the big FACTS and let small dims
  * broadcast; bucketing both sides only pays when both are too big to
  * broadcast, which is exactly the case this operator exists for.
  */
object Bucketing {

  /** Write `df` as a catalog-managed bucketed table (overwriting any
    * previous incarnation), bucketed AND sorted by `key` — sorting
    * within buckets lets the later sort-merge join skip its sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    // an in-memory catalog dies with the JVM but the managed location
    // does not: a fresh session would hit LOCATION_ALREADY_EXISTS on
    // the orphaned directory, so drop both the entry and the leftover
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet") // managed: lives under spark.sql.warehouse.dir
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. The `merge` hint
    * keeps the plan a sort-merge join even when one side would
    * broadcast (a broadcast would hide the co-location this operator
    * demonstrates); with equal bucket counts on both sides, neither
    * input shuffles.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable)
    l.join(r, col(leftKey) === col(rightKey))
  }
}
