package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed prefix sum (the classic two-phase scan), and the
  * training-data operator built on it: token-budget sharding.
  *
  * The naive Spark spelling of a global running total —
  * `Window.orderBy(key)` with no partitionBy — collapses the whole
  * dataset into ONE partition on one task: correct at test scale,
  * a non-starter at 100 TB. The scan here shuffles the data exactly
  * ONCE (pinned in PlanSpec): range-partition on the order key, then a
  * partition-LOCAL imperative scan — mapPartitions, the sanctioned
  * last resort, used deliberately because the declarative spelling
  * (`Window.partitionBy(spark_partition_id())`) cannot tell Catalyst
  * the key is a function of the existing partitioning and pays a
  * SECOND full hash exchange — then one driver-collected offsets table
  * (≤ numPartitions rows) broadcast back.
  */
object PrefixSum {

  /** Global running total of `valueCol` (cast to long; nulls count 0)
    * in ascending `orderCol` order (inclusive: the row's own value is
    * counted), as column `outCol`. `orderCol` must be unique per row —
    * ties straddling a partition boundary would make "running"
    * ambiguous (any unique id or (ts, id) composite works; document
    * ids are the normal case).
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    val reserved = Seq("_v", "_pid", "_local", "_offset", outCol)
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"runningTotal uses ${clash.mkString(", ")} internally; rename the input column(s)")
    val spark = df.sparkSession
    // phase 1: ONE range exchange, partition-sorted, then a local
    // inclusive scan. RangePartitioning orders partitions by key, so
    // TaskContext partition ids follow the global order.
    val prepared = df
      .withColumn("_v", coalesce(col(valueCol).cast("long"), lit(0L)))
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val vIdx = prepared.schema.fieldIndex("_v")
    val outSchema = prepared.schema.add("_pid", IntegerType).add("_local", LongType)
    val local = prepared.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var acc = 0L
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ pid :+ acc) }
    }(Encoders.row(outSchema)).persist()
    // phase 2: per-partition totals -> exclusive offsets (driver-side
    // scanLeft over <= numPartitions rows), broadcast back. The agg's
    // map-side partial reduces each partition to one row before its
    // exchange, so the data itself never shuffles again.
    val totals = local.groupBy(col("_pid"))
      .agg(max(col("_local")).as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_pid", "_offset")
    val out = local.join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(outCol, col("_local") + col("_offset"))
      .drop("_pid", "_local", "_offset", "_v")
    local.unpersist()
    out
  }

  /** Pack documents into training shards of ≈ `budget` tokens each:
    * shard k holds the docs whose token stream covers
    * [k·budget, (k+1)·budget). Docs stay whole (a shard overflows by
    * at most one doc — the standard sequence-packing relaxation), the
    * assignment is a pure function of the id order, so it is
    * reproducible and the FULL table sits under the oracle gate. All
    * integer arithmetic — no float drift anywhere.
    *
    * Output: input columns + (n_tokens, shard).
    */
  def tokenBudgetShards(docs: DataFrame, budget: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val withTokens = docs.withColumn("n_tokens",
      graft.ext.TextOps.tokenCount(col(textCol)).cast("long"))
    // `div`, not `/`: Spark's / on longs is DOUBLE division (precision
    // cliff past 2^53 and a float in an otherwise integer-exact gate)
    runningTotal(withTokens, idCol, "n_tokens", "_run")
      .withColumn("shard", expr(s"(_run - n_tokens) div $budget"))
      .drop("_run")
  }
}
