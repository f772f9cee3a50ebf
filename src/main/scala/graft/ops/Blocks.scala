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
    rdds.size
  }
}
