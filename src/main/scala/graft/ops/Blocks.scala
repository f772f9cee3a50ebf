package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Block-manager hygiene for iterative operators and long-lived
  * sessions.
  *
  * `Dataset.localCheckpoint` persists the materialized RDD, but
  * `Dataset.unpersist` only consults the CacheManager — which never
  * sees checkpoint RDDs — so a checkpointed round's blocks stay in the
  * block manager until the APPLICATION ends unless the RDD itself is
  * unpersisted. Inside an iterative loop that is a per-round leak; for
  * the loop's RETURNED frame it is a one-table leak the library cannot
  * free itself (the caller reads the frame lazily, and a freed
  * localCheckpoint cannot recompute — its lineage is truncated by
  * design). Contract: every graft iterative operator frees its
  * intermediate rounds eagerly and returns a frame holding O(1) live
  * checkpointed tables — one materialized result, or for the
  * lazy-returning rank loops the checkpointed edge and node-id inputs
  * the plan reads (never one per round); a long-lived session (the bench harness, a
  * notebook) calls [[sweep]] between units of work to reclaim those
  * finals. A short-lived job (Verify, a spark-submit batch) can ignore
  * all of this — the JVM exit reclaims everything.
  *
  * Why it matters at 100 TB: on a real cluster the leaked blocks sit
  * in EXECUTOR storage memory, shrinking the execution pool under the
  * unified memory manager — a session running hundreds of iterative
  * queries degrades slowly (more spilling, more GC) with nothing in
  * any single query's plan to blame. The r14 bench showed exactly this
  * signature in miniature: late passes of the multi-job iterative
  * queries (s02, t25, d37) ran 2–4× their early-pass times while
  * single-job queries sat tight.
  */
object Blocks {

  /** Free a [[org.apache.spark.sql.Dataset.localCheckpoint]]'s blocks.
    * Walks the analyzed plan for `LogicalRDD` leaves (what a
    * checkpointed Dataset's plan collapses to) and unpersists their
    * RDDs directly — the only handle the CacheManager-based
    * `Dataset.unpersist` misses. No-op on frames that are not
    * checkpointed. NEVER call on a frame that still has unexecuted
    * consumers: a freed localCheckpoint cannot be recomputed.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The REAL materialized size of an (eagerly) localCheckpointed
    * frame, read from the block manager with NO job: sums mem+disk
    * bytes of every `LogicalRDD` leaf in the plan. None when any leaf
    * is not a checkpoint or its blocks are not (yet) reported — the
    * caller must then treat the size as unknown, not zero. The honest
    * input to a broadcast decision (guide §3: broadcast only what
    * FITS): planner estimates over checkpointed chains are garbage,
    * and a counting job would cost what this lookup gets for free.
    */
  def materializedBytes(df: DataFrame): Option[Long] = {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    var allCheckpoints = true
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => ids += lr.rdd.id
      case leaf if leaf.children.isEmpty &&
          leaf.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode] =>
        leaf match {
          case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => ()
          case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => ()
          case _ => allCheckpoints = false
        }
      case _ => ()
    }
    if (!allCheckpoints || ids.isEmpty) None
    else {
      val info = df.sparkSession.sparkContext.getRDDStorageInfo
        .filter(i => ids.contains(i.id))
      if (info.length != ids.distinct.size) None
      else Some(info.map(i => i.memSize + i.diskSize).sum)
    }
  }

  /** Unpersist EVERY persistent RDD in the context — cached frames and
    * checkpoint blocks alike — and return how many were dropped. For
    * session-lifecycle seams where no live frame is still being
    * consumed: between bench queries, between notebook cells, between
    * pipeline stages that communicate through written artifacts. Not
    * for use inside an operator (it would drop OTHER operators' live
    * caches).
    */
  def sweep(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
    // ALSO clear the CacheManager: a query-internal `.persist()` (the
    // t24/t31 lazy-cache pattern) registers an InMemoryRelation entry
    // on the DRIVER that unpersisting the RDDs above does not remove —
    // across a long session those entries accumulate one per distinct
    // cached plan (r16 advice). The session seam is exactly where no
    // live frame may depend on a cache, so dropping the entries is
    // safe, and it keeps the no-cross-query-caching contract honest:
    // the next query re-materializes from parquet rather than silently
    // rebinding to a warm entry.
    spark.catalog.clearCache()
    rdds.size
  }
}
