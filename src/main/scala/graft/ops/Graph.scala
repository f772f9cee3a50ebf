package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics in the Pregel-on-DataFrames shape:
  * per iteration, ONE shuffle joins ranks to edges on `src` and ONE
  * aggregates contributions on `dst` — the standard distributed
  * PageRank profile (no driver-side adjacency, nothing scales with
  * the graph on one machine). Complements [[graft.ext.Dedup.clusters]]
  * (connected components by iterative min-label propagation).
  */
object Graph {

  /** Deterministic INTEGER PageRank (damping 0.85, unnormalized
    * teleport): ranks are micro-units starting at 10⁶ per node and
    * every update is positive-integer multiply/divide —
    *
    *   rank'(v) = 150000 + (85 · Σ_{u→v} (rank(u) div deg(u))) div 100
    *
    * so the whole iteration chain replays exactly in SQL (Spark `div`
    * == DuckDB `//` on positive longs; no float ever exists — the s05
    * exact-integer-state principle applied to graph iteration).
    * Dangling nodes (no out-edges) keep receiving teleport mass but
    * contribute none — the standard simplification; callers that need
    * mass conservation add a dangling-sum redistribution term.
    *
    * `nodes` is (id: long); `edges` is (src, dst) — pass both
    * directions for an undirected graph. Per iteration the plan is a
    * join on src + an aggregation on dst + a left join back to nodes.
    * The degree-joined edge frame is loop-INVARIANT but referenced by
    * every iteration. Within one action Spark's exchange reuse usually
    * dedupes the repeated subplan, but that is a physical-planner
    * OPTIMIZATION, not a contract — it disappears when the caller
    * materializes ranks across separate actions (convergence checks,
    * checkpointed chains) and an expensive edge derivation (the d02
    * similarity join in g01) would then be re-paid per action.
    * `materialize` (default) eagerly `localCheckpoint`s the frame once
    * so edge cost is paid exactly once REGARDLESS of how the caller
    * drives the loop, and the edge lineage is cut for long chains;
    * pass false when the input is a plain scan that's cheaper to
    * re-read than to pin. Rank plans nest linearly in `iters` — for
    * long chains (> ~10) interpose `localCheckpoint()` on the rank
    * frame too (the [[graft.ext.Dedup.clusters]] lineage rule).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val joined = edges.join(deg, "src")
    val e = if (materialize) joined.localCheckpoint() else joined
    var r = nodes.select(col("id"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div d").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      r = nodes.select(col("id")).join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r
  }
}
