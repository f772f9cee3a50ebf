package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed prefix sum (the classic two-phase scan), and the
  * training-data operator built on it: token-budget sharding.
  *
  * The naive Spark spelling of a global running total —
  * `Window.orderBy(key)` with no partitionBy — collapses the whole
  * dataset into ONE partition on one task: correct at test scale,
  * a non-starter at 100 TB. The scan here runs two jobs:
  *
  *   1. ONE range exchange on the order key, reduced map-side to
  *      ≤ numPartitions `(minKey, partitionTotal)` rows on the driver
  *      (an exact `sum`, so negative values are handled — `max` of a
  *      local scan would not be).
  *   2. Each row is assigned a dense bucket id by comparing the order
  *      key against the job-1 min-key boundaries as LITERALS, then ONE
  *      hash exchange on the bucket, a partition-local scan that
  *      resets per bucket (mapPartitions — the sanctioned last resort,
  *      used because the declarative spelling pays a second full
  *      exchange for a window), and a broadcast join of the
  *      ≤ numPartitions exclusive offsets.
  *
  * Keying the offsets on literal-derived buckets rather than physical
  * partition ids makes the result independent of recomputation:
  * Spark's range partitioner samples with an RDD-id-derived seed, so a
  * recomputed exchange may draw DIFFERENT boundaries — offsets keyed
  * on physical partition ids silently shift under recompute unless the
  * intermediate is pinned in cache. Boundaries collected once and
  * re-applied as literals are consistent by construction, which also
  * removes the need to persist a full-width 100 TB intermediate (the
  * price: the source is scanned once per job, from pruned columns in
  * job 1).
  */
object PrefixSum {

  /** Global running total of `valueCol` (cast to long; nulls count 0,
    * negative values are summed exactly) in ascending `orderCol` order
    * (inclusive: the row's own value is counted), as column `outCol`.
    * `orderCol` must be unique and non-null per row — ties straddling
    * a bucket boundary would make "running" ambiguous (any unique id
    * or (ts, id) composite works; document ids are the normal case).
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    val reserved = Seq("_v", "_pid", "_bucket", "_local", "_offset", outCol)
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"runningTotal uses ${clash.mkString(", ")} internally; rename the input column(s)")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .withColumn("_v", coalesce(col(valueCol).cast("long"), lit(0L)))
    // job 1: range-exchange once, then collapse each partition to a
    // single (minKey, total) row before the tiny final agg. Reads only
    // (orderCol, valueCol) thanks to column pruning. The partition
    // count is pinned explicitly: AQE would coalesce a small exchange
    // to one partition (one bucket = a single-partition job 2), and
    // coalescing buys nothing here since the agg output is one row per
    // partition regardless.
    val numBuckets = spark.sessionState.conf.numShufflePartitions
    val groups = prepared
      .select(col(orderCol), col("_v"))
      .repartitionByRange(numBuckets, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .groupBy(col("_pid"))
      .agg(min(col(orderCol)).as("_min"), sum(col("_v")).as("_tot"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
      .sortBy(_._1) // range-partition ids follow the key order
    // dense bucket k ⇔ job-1 range partition k; boundaries are the min
    // keys of buckets 1.. (every key of the SAME df falls back into
    // its own bucket: k ∈ bucket i ⇔ min_i <= k < min_{i+1})
    val boundaries = groups.drop(1).map(_._2)
    val offsets = groups.map(_._3).scanLeft(0L)(_ + _).init
    val offsetDf = offsets.zipWithIndex
      .map { case (off, i) => (i, off) }.toSeq.toDF("_bucket", "_offset")
    val bucketExpr: Column = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) >= lit(b), 1).otherwise(0)
    }
    // job 2: ONE hash exchange on the bucket (a bucket must never
    // split across partitions, which range-sampling could do), sorted
    // within partitions so co-hashed buckets stay contiguous, then the
    // local inclusive scan resetting at bucket changes.
    val nb = math.max(groups.length, 1)
    val bucketed = prepared
      .withColumn("_bucket", bucketExpr)
      .repartition(nb, col("_bucket"))
      .sortWithinPartitions(col("_bucket"), col(orderCol))
    val vIdx = bucketed.schema.fieldIndex("_v")
    val bIdx = bucketed.schema.fieldIndex("_bucket")
    val outSchema = bucketed.schema.add("_local", LongType)
    val local = bucketed.mapPartitions { it =>
      var cur = Int.MinValue
      var acc = 0L
      it.map { r =>
        val b = r.getInt(bIdx)
        if (b != cur) { cur = b; acc = 0L }
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
    local.join(broadcast(offsetDf), Seq("_bucket"))
      .withColumn(outCol, col("_local") + col("_offset"))
      .drop("_bucket", "_local", "_offset", "_v")
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

  /** GPT-style sequence-packing manifest (concat-and-chunk): docs are
    * laid end to end in id order into one global token stream, which is
    * cut into fixed `seqLen` training sequences; each doc reports the
    * sequences it lands in. Unlike [[tokenBudgetShards]] (docs stay
    * whole, shards stretch), here the SEQUENCES stay fixed-length and
    * docs SPLIT across them — the packing used when every training row
    * must be exactly the context length.
    *
    * Output: input columns + n_tokens, `offset` (global 0-based start
    * of the doc's tokens), `first_seq`/`last_seq` (the sequence range
    * the doc spans; a zero-token doc degenerates to the sequence at its
    * offset). Built on [[runningTotal]]'s two-phase scan — no
    * single-partition window — and all-integer, so the full manifest
    * sits under the oracle gate.
    */
  def seqPack(docs: DataFrame, seqLen: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val withTokens = docs.withColumn("n_tokens",
      graft.ext.TextOps.tokenCount(col(textCol)).cast("long"))
    runningTotal(withTokens, idCol, "n_tokens", "_run")
      .withColumn("offset", col("_run") - col("n_tokens"))
      .withColumn("first_seq", expr(s"offset div $seqLen"))
      .withColumn("last_seq",
        expr(s"(offset + greatest(n_tokens - 1, 0)) div $seqLen"))
      .drop("_run")
  }
}
