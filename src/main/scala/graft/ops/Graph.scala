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
    // materialize the node-id frame ONCE: the per-iteration zero-restore
    // join otherwise embeds the caller's whole `nodes` subtree (for the
    // crawl queries: a documents scan + link harvest + distinct) iters+1
    // times in the final plan — r16 measured g10's single action at 16
    // parquet scans / 44 exchanges from exactly this duplication
    val ids0 = nodes.select(col("id"))
    val ids = if (materialize) ids0.localCheckpoint() else ids0
    var r = ids.select(col("id"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div d").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      r = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r
  }

  /** [[pageRank]] with CONVERGENCE DETECTION (the r12 verdict task 7
    * contract, [[labelPropagationConverged]]'s sibling): the same exact
    * integer recurrence, but iterations stop once NO node's rank moved
    * by more than `tolMicros` since the previous round — capped at
    * `maxIters`, with the executed round count returned. roundsRun <
    * maxIters means the trajectory is inside its tolerance band, and
    * at tolMicros = 0 it is an EXACT integer fixpoint: the result
    * equals the fixed-iter operator at every iters >= roundsRun − 1,
    * so downstream gates can replay the pinned count. roundsRun ==
    * maxIters is the caller-visible "deep graph or quantization
    * 2-cycle" signal — raise the cap or allow a few micros of
    * tolerance (integer quantization can oscillate ±1 micro forever
    * where float PageRank would drift below any epsilon).
    *
    * Detection costs one node-sized join per round against the
    * previous (localCheckpointed) ranks; rank frames are checkpointed
    * every round so plan depth stays constant however deep the
    * trajectory runs.
    */
  def pageRankConverged(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 64, tolMicros: Long = 0L,
      materialize: Boolean = true): (DataFrame, Int) = {
    require(maxIters >= 1, "maxIters must be >= 1")
    require(tolMicros >= 0L, "tolMicros must be >= 0")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val joined = edges.join(deg, "src")
    val e = if (materialize) joined.localCheckpoint() else joined
    // node ids materialized once — every round's zero-restore join
    // would otherwise re-evaluate the caller's `nodes` subtree (see
    // [[pageRank]]); freed before return (the result is a checkpoint).
    // Guarded by `materialize` (r16 advice): an opt-out caller must not
    // pay an eager job either — it accepts the per-round re-evaluation.
    val ids0 = nodes.select(col("id"))
    val ids = if (materialize) ids0.localCheckpoint() else ids0
    var r = ids.select(col("id"), lit(1000000L).as("rank")).localCheckpoint()
    var rounds = 0
    var stable = false
    while (rounds < maxIters && !stable) {
      val contrib = e.join(r.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst").as("id"), expr("rank div d").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      // ONE job per round (r16 verdict task 5, the clusters fusion):
      // the previous round's rank rides the LAZY checkpoint as `_prev`,
      // and the tolerance count below is the checkpoint's materializing
      // action — the old protocol (eager checkpoint job + a separate
      // join-and-isEmpty action, the latter take-escalating over EVERY
      // partition exactly when the round IS stable) paid 2+ driver jobs
      // per round for the same information
      val next = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100"))
            .as("rank"))
        .join(r.select(col("id"), col("rank").as("_prev")), "id")
        .localCheckpoint(false)
      rounds += 1
      stable = next.filter(abs(col("rank") - col("_prev")) > tolMicros)
        .count() == 0L
      // next is materialized (by the count) and has read r — the
      // previous round's blocks are dead weight from here
      // ([[graft.ops.Blocks]] contract: at most ONE live checkpoint
      // survives the call, the returned frame)
      Blocks.free(r)
      r = next
    }
    if (materialize) Blocks.free(ids) // every consumer of ids has materialized
    if (materialize) Blocks.free(e) // r is a checkpoint; e is no longer needed
    (r.select(col("id"), col("rank")), rounds)
  }

  /** Personalized PageRank — [[pageRank]] with the teleport mass
    * restricted to a SEED set: rank flows outward from the seeds
    * through the graph, so the score ranks every node by graph
    * proximity to the seeds rather than by global centrality. On a
    * near-dup/similarity graph this is retrieval-by-relationship:
    * "given these known-good (or known-bad) documents, which others
    * are pulled toward them?" — the seed-expansion step of curation
    * (expanding a labeled set along the similarity structure) that
    * plain top-k cosine cannot do transitively.
    *
    * Same exact integer recurrence as [[pageRank]] with the floor made
    * conditional:
    *
    *   rank'(v) = (v ∈ seeds ? 150000 : 0)
    *            + (85 · Σ_{u→v} (rank(u) div deg(u))) div 100
    *
    * starting from 10⁶ on seeds and 0 elsewhere, so non-seed nodes
    * hold EXACTLY the mass that reached them through edges (a node
    * unreachable from every seed stays at 0 — a checkable contract).
    * All positive-integer arithmetic; the whole trajectory replays in
    * SQL. `seeds` is (id: long); it is joined once into the node frame
    * (broadcast-sized in any practical use — a labeled set).
    */
  def pageRankPersonalized(nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
      iters: Int = 3, materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val joined = edges.join(deg, "src")
    val e = if (materialize) joined.localCheckpoint() else joined
    val seeded0 = nodes.select(col("id"))
      .join(seeds.select(col("id")).distinct().withColumn("_s", lit(1)),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), lit(0)).as("is_seed"))
    // materialized once — referenced per iteration (see [[pageRank]])
    val seeded = if (materialize) seeded0.localCheckpoint() else seeded0
    var r = seeded.select(col("id"), col("is_seed"),
      (col("is_seed").cast("long") * 1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst").as("id"), expr("rank div d").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      r = seeded.join(contrib, Seq("id"), "left")
        .select(col("id"), col("is_seed"),
          (col("is_seed").cast("long") * 150000L +
            expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r.select(col("id"), col("rank"))
  }

  /** Weight-proportional PageRank — [[pageRank]] with each node's rank
    * split across out-edges BY EDGE WEIGHT instead of uniformly: on a
    * similarity graph, a 0.9-Jaccard near-duplicate should pull far
    * more of a doc's centrality than a 0.5 borderline pair, which is
    * exactly the difference between "hub of one redundant cluster" and
    * "quoted once by many unrelated docs". Same exact integer
    * recurrence as the unweighted form with `rank·w div W_src`
    * replacing `rank div d` (weights are integer micros, W_src their
    * per-source sum — products stay ≤ ~10¹³, overflow-free in BIGINT),
    * so every iteration replays in SQL and the whole trajectory
    * hash-gates. Per iteration: one weighted-edge join + one dst
    * aggregation; the weight-sum table is computed once and rides the
    * (optionally checkpointed) edge frame.
    */
  def pageRankWeighted(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      weightCol: String = "w", materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val wsum = edges.groupBy("src").agg(sum(col(weightCol)).as("ws"))
    val joined = edges.join(wsum, "src")
    val e = if (materialize) joined.localCheckpoint() else joined
    // node ids materialized once — see [[pageRank]]
    val ids0 = nodes.select(col("id"))
    val ids = if (materialize) ids0.localCheckpoint() else ids0
    var r = ids.select(col("id"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr(s"rank * $weightCol div ws").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      r = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r
  }

  /** [[pageRankWeighted]] with a WARM-START rank vector — the
    * incremental-recrawl primitive behind [[RankIndex]]: instead of
    * initializing every node at the uniform 10⁶ prior, `init`
    * (id, rank) seeds nodes with a previously computed (persisted)
    * rank vector and the recurrence runs `iters` rounds over the
    * CURRENT edge set. Nodes absent from `init` — domains first seen
    * in this crawl batch — start at the uniform prior via the left
    * join's coalesce, so a warm start over an unchanged graph with
    * iters = 0 extra rounds would be the identity and each warm round
    * is EXACTLY the fixed recurrence round (same integer arithmetic,
    * same SQL replay — the whole base + warm trajectory hash-gates as
    * one unrolled CTE chain).
    *
    * Why it matters at 100 TB: a weekly recrawl that re-ranks from
    * uniform pays the full convergence depth over the whole domain
    * graph every week; warm-starting from last week's fixpoint needs
    * only the rounds the DELTA actually perturbs (typically 1–2), and
    * every round is still two domain-cardinality shuffles. Same
    * edge-materialization contract as [[pageRankWeighted]].
    */
  def pageRankWeightedFrom(nodes: DataFrame, edges: DataFrame,
      init: DataFrame, iters: Int = 3, weightCol: String = "w",
      materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val wsum = edges.groupBy("src").agg(sum(col(weightCol)).as("ws"))
    val joined = edges.join(wsum, "src")
    val e = if (materialize) joined.localCheckpoint() else joined
    // node ids materialized once — see [[pageRank]]
    val ids0 = nodes.select(col("id"))
    val ids = if (materialize) ids0.localCheckpoint() else ids0
    var r = ids
      .join(init.select(col("id"), col("rank").as("_init")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_init"), lit(1000000L)).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr(s"rank * $weightCol div ws").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      r = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r
  }

  /** HITS hubs-and-authorities over a weighted DIRECTED graph — the
    * other classic crawl-frontier centrality next to
    * [[pageRankWeighted]]: a good HUB is a page community that links
    * to good authorities, a good AUTHORITY is one that good hubs link
    * to. On a crawl's domain graph the authority score ranks FETCH
    * targets while the hub score ranks SEED/re-crawl sources — the two
    * sides of frontier scheduling.
    *
    * Integer-exact (the g01/g10 discipline — both engines replay the
    * identical trajectory, no float drift): scores live in micros,
    * each half-iteration is a weighted sum over in- (resp. out-) edges
    * followed by L1 normalization `s·10⁶ div Σs` with truncating
    * integer division (classic HITS normalizes by L2; L1 keeps every
    * step a rational of longs, and the RANKING — the thing a frontier
    * consumes — is scale-invariant). The normalizer stays in-plan as a
    * broadcast 1-row cross join; nothing touches the driver. Overflow
    * headroom: after normalization Σscore ≤ 10⁶, so a weighted sum is
    * ≤ 10⁶·Σw — fine in a long for any real edge multiset.
    *
    * Nodes without in-edges hold authority 0, without out-edges hub 0
    * (exact zeros under the gate, the g06 unreachable contract). Scale
    * shape: two shuffles per half-iteration (the contribution rollup +
    * the normalizer agg, the latter a 1-row reduce), all keyed at node
    * cardinality — domain-level for a crawl, never page-level.
    */
  def hits(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
      weightCol: String = "w", materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e0 = edges.select(col("src"), col("dst"), col(weightCol).as("w"))
    val e = if (materialize) e0.localCheckpoint() else e0
    // node ids materialized once — referenced by every half-step's
    // zero-restore join (see [[pageRank]]: without this the caller's
    // whole `nodes` subtree re-evaluates per half-step)
    val ids0 = nodes.select(col("id"))
    val ids = if (materialize) ids0.localCheckpoint() else ids0

    // one weighted-sum + L1-normalize half-step: scores keyed by
    // `from` flow along (from → to) edges and land keyed by `to`
    def halfStep(scores: DataFrame, from: String, to: String): DataFrame = {
      val raw = e.join(scores.withColumnRenamed("id", from), from)
        .select(col(to).as("id"), (col("s") * col("w")).as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      val withZeros = ids.join(raw, Seq("id"), "left")
        .select(col("id"), coalesce(col("c"), lit(0L)).as("c"))
      val total = withZeros.agg(greatest(sum("c"), lit(1L)).as("tot"))
      withZeros.crossJoin(broadcast(total))
        .select(col("id"), expr("c * 1000000L div tot").as("s"))
    }

    // both vectors ride ONE combined (id, a_s, h_s) frame per round:
    // one checkpoint job per round instead of two (the auth half-step's
    // node-cardinality subtree re-evaluates inside the hub side of the
    // same job — far cheaper than a whole extra driver job per round)
    var cur = ids.select(col("id"), lit(0L).as("a_s"), lit(1000000L).as("h_s"))
    var curOwned = false
    for (_ <- 1 to iters) {
      // materialize each round (the pageRankWeighted discipline —
      // Graph.scala's join-chain lineage doubles per iteration, so an
      // uncheckpointed run at iters=10+ builds an exponentially nested
      // plan) and free the previous round's blocks immediately
      // ([[graft.ops.Blocks]] contract)
      val a = halfStep(cur.select(col("id"), col("h_s").as("s")), "src", "dst")
      val h = halfStep(a, "dst", "src")
      val nxt0 = a.withColumnRenamed("s", "a_s")
        .join(h.withColumnRenamed("s", "h_s"), "id")
      if (materialize) {
        val nxt = nxt0.localCheckpoint()
        if (curOwned) Blocks.free(cur)
        cur = nxt; curOwned = true
      } else cur = nxt0
    }
    val out = cur.select(col("id"), col("h_s").as("hub_micro"),
      col("a_s").as("auth_micro"))
    if (materialize) {
      // the returned frame reads only the final round's checkpoint —
      // edge and id blocks are dead weight from here
      Blocks.free(e); Blocks.free(ids)
    }
    out
  }

  /** Convergence-run HITS — [[hits]] at the DETECTED fixpoint instead
    * of a guessed iteration count (the g08/g09 pattern applied to
    * hubs-and-authorities): run full iterations until BOTH score
    * vectors repeat their predecessor's exactly (the integer
    * recurrence is deterministic, so one repeated round is a true
    * fixpoint — every later round replays it) or `maxIters` fires.
    * `tolMicros` relaxes equality to a per-node absolute band.
    *
    * Returns (scores, roundsRun, stable): `stable == true` means the
    * LAST executed round was a no-op, so the scores are the
    * recurrence's fixpoint; `stable == false` means the cap fired
    * first — a truncating-integer HITS can limit-cycle rather than
    * settle, and the flag (NOT the round count — a run converging
    * exactly at the cap still reports stable) is what callers must
    * branch on before trusting the scores as converged. Same
    * per-round localCheckpoint + free discipline as [[hits]], so plan
    * depth and block-manager residency stay constant however far the
    * trajectory runs.
    */
  def hitsConverged(nodes: DataFrame, edges: DataFrame, maxIters: Int = 64,
      tolMicros: Long = 0L, weightCol: String = "w",
      materialize: Boolean = true): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, "maxIters must be >= 1")
    require(tolMicros >= 0L, "tolMicros must be >= 0")
    val e0 = edges.select(col("src"), col("dst"), col(weightCol).as("w"))
    val e = if (materialize) e0.localCheckpoint() else e0
    // node ids materialized once — see [[hits]]; freed before return.
    // Guarded by `materialize` (r16 advice): an opt-out caller must not
    // pay an eager job either — it accepts the per-round re-evaluation.
    val ids1 = nodes.select(col("id"))
    val ids = if (materialize) ids1.localCheckpoint() else ids1

    def halfStep(scores: DataFrame, from: String, to: String): DataFrame = {
      val raw = e.join(scores.withColumnRenamed("id", from), from)
        .select(col(to).as("id"), (col("s") * col("w")).as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      val withZeros = ids.join(raw, Seq("id"), "left")
        .select(col("id"), coalesce(col("c"), lit(0L)).as("c"))
      val total = withZeros.agg(greatest(sum("c"), lit(1L)).as("tot"))
      withZeros.crossJoin(broadcast(total))
        .select(col("id"), expr("c * 1000000L div tot").as("s"))
    }

    // both vectors ride ONE combined (id, a_s, h_s) checkpoint per
    // round (the [[hits]] r16 restructure), and the round's SINGLE
    // driver job both materializes it and answers the stability
    // question (r16 verdict task 5): the previous round's scores ride
    // the LAZY checkpoint as `_pa`/`_ph` and the OR-filter count below
    // is its materializing action — the old protocol (eager checkpoint
    // job + a separate join-and-isEmpty, the latter take-escalating
    // over every partition exactly when the round IS stable) paid 2+
    // driver jobs per round for the same information
    var cur = ids.select(col("id"), lit(0L).as("a_s"),
      lit(1000000L).as("h_s")).localCheckpoint()
    var rounds = 0
    var stable = false
    while (rounds < maxIters && !stable) {
      val a = halfStep(cur.select(col("id"), col("h_s").as("s")), "src", "dst")
      val h = halfStep(a, "dst", "src")
      val nxt = a.withColumnRenamed("s", "a_s")
        .join(h.withColumnRenamed("s", "h_s"), "id")
        .join(cur.select(col("id"), col("a_s").as("_pa"),
          col("h_s").as("_ph")), "id")
        .localCheckpoint(false)
      rounds += 1
      stable = nxt.filter(abs(col("a_s") - col("_pa")) > tolMicros ||
          abs(col("h_s") - col("_ph")) > tolMicros).count() == 0L
      // nxt is materialized (by the count) and has read cur — the
      // previous round's blocks are dead weight from here
      Blocks.free(cur)
      cur = nxt
    }
    val result = cur.select(col("id"), col("h_s").as("hub_micro"),
      col("a_s").as("auth_micro"))
    if (materialize) Blocks.free(ids)
    if (materialize) Blocks.free(e)
    (result, rounds, stable)
  }

  /** Per-node triangle participation counts over an UNDIRECTED simple
    * graph, by degree-ordered edge orientation — the standard
    * distributed formulation (each triangle is enumerated exactly once
    * from its lowest-rank vertex, so the wedge join's fan-out is
    * bounded by ORIENTED out-degrees: a celebrity node of degree d
    * contributes O(d²) wedges under naive orientation but only
    * O((d_out)²) here, and degree-ordering caps d_out at O(√m) —
    * the skew lever that makes triangle counting survive power-law
    * graphs at scale).
    *
    * `edges` is (src, dst), one row per undirected edge in either
    * orientation (duplicates/self-loops dropped defensively). Plan:
    * canonicalize + distinct, ONE degree agg, orient by (degree, id),
    * then one self-join on the wedge pivot + one semi-ish join back to
    * the oriented edge set, and an explode+agg to per-node counts.
    * Nodes in no triangle get 0 via the left join to the node set.
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // canonical undirected edge (a < b), each exactly once
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient each edge from lower (deg, id) to higher — a total order,
    // so the oriented graph is acyclic and every triangle has exactly
    // one source vertex with two out-edges
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges u -> (v, w) with v < w in the orientation order are closed
    // by an oriented edge (v, w); re-derive the order via degree join
    // is avoided by joining both wedge legs directly on the edge list
    // each unordered out-neighbor pair once (x < y by id): out-edges
    // are distinct, so no dedup exchange is needed anywhere below
    val e1 = oriented.select(col("u"), col("v").as("x"))
    val e2 = oriented.select(col("u"), col("v").as("y"))
    val wedges = e1.join(e2, "u").filter(col("x") < col("y"))
      .select(col("u"), col("x").as("p"), col("y").as("q"))
    // a wedge closes iff p–q is an oriented edge; the orientation
    // between p and q follows (deg, id) order, not id order, so probe
    // both directions (disjoint by acyclicity — no dedup needed)
    val closing = oriented.select(col("u").as("p"), col("v").as("q"))
      .union(oriented.select(col("v").as("p"), col("u").as("q")))
    val triangles = wedges.join(closing, Seq("p", "q"))
      .select(col("u").as("n1"), col("p").as("n2"), col("q").as("n3"))
    val perNode = triangles
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    nodes.select(col("id")).join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Synchronous label propagation — community detection over an
    * UNDIRECTED graph in `iters` fixed rounds of deterministic integer
    * state (the s05/g01 exact-trajectory principle): every node starts
    * labeled with its own id; each round it adopts the label that the
    * MOST neighbors currently carry, ties broken toward the SMALLEST
    * label, nodes with no neighbors keep their label. Unlike
    * [[graft.ext.Dedup.clusters]] (connected components = "reachable at
    * all"), majority vote splits a weakly-bridged graph at its thin
    * cuts — two dense near-dup clusters joined by one borderline pair
    * stay two communities, which is the grouping a curation policy
    * wants when CC over-merges.
    *
    * Determinism: the per-node argmax is `min(struct(-count, label))` —
    * one aggregation, no window machinery — which is exactly
    * "count DESC, label ASC pick-first" (negating the always-positive
    * count keeps the trick valid for ANY label domain), so the whole
    * trajectory replays in SQL and hash-gates. Fixed `iters` (no
    * convergence check) keeps the replay finite; synchronous LPA can
    * oscillate on bipartite structures, but a pinned iteration count
    * makes the output well-defined regardless.
    *
    * `nodes` is (id: long); `edges` is (src, dst) — pass both
    * directions for an undirected graph. Per round: one join on src +
    * two aggregations keyed on the receiving node + one left join back
    * (absent votes keep the old label). The edge frame is loop-invariant
    * and `materialize` pins it once, the [[pageRank]] contract; labels
    * are `localCheckpoint`ed per round so plan depth stays constant in
    * `iters` (the [[graft.ext.Dedup.clusters]] lineage rule).
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = if (materialize) edges.select("src", "dst").localCheckpoint()
            else edges.select("src", "dst")
    var l = nodes.select(col("id"), col("id").as("label"))
    var lOwned = false // only free checkpoints THIS call created
    for (_ <- 1 to iters) {
      val votes = e.join(l.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val pick = votes
        .groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("id"), col("m.label").as("picked"))
      val next = l.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("picked"), col("label")).as("label"))
        .localCheckpoint()
      if (lOwned) Blocks.free(l)
      l = next; lOwned = true
    }
    if (materialize) Blocks.free(e) // final l is a checkpoint
    l.select(col("id"), col("label").as("community"))
  }

  /** Weighted label propagation — [[labelPropagation]] with each
    * neighbor's vote counted at its EDGE WEIGHT instead of 1: on a
    * similarity graph a 0.9-Jaccard neighbor pulls harder than a 0.5
    * borderline one, so a node bridged between a strong clique and a
    * weak one lands with the strong side even when the weak side has
    * more members — the uniform/weighted pattern [[pageRank]]/
    * [[pageRankWeighted]] established, applied to communities. Same
    * deterministic argmax (`min(struct(-Σw, label))` — weight-sum DESC,
    * label ASC), integer weights end to end, same per-round plan with
    * `sum(w)` replacing `count`. Equal weights degenerate to the
    * uniform operator exactly (spec-pinned).
    */
  def labelPropagationWeighted(nodes: DataFrame, edges: DataFrame,
      iters: Int = 3, weightCol: String = "w",
      materialize: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e0 = edges.select(col("src"), col("dst"), col(weightCol).as("_w"))
    val e = if (materialize) e0.localCheckpoint() else e0
    var l = nodes.select(col("id"), col("id").as("label"))
    var lOwned = false // only free checkpoints THIS call created
    for (_ <- 1 to iters) {
      val votes = e.join(l.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(sum(col("_w")).as("c"))
      val pick = votes
        .groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("id"), col("m.label").as("picked"))
      val next = l.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("picked"), col("label")).as("label"))
        .localCheckpoint()
      if (lOwned) Blocks.free(l)
      l = next; lOwned = true
    }
    if (materialize) Blocks.free(e) // final l is a checkpoint
    l.select(col("id"), col("label").as("community"))
  }

  /** [[labelPropagation]] / [[labelPropagationWeighted]] with
    * CONVERGENCE DETECTION: the same deterministic vote rule (majority,
    * ties to the smallest label, `sum(w)` votes when `weightCol` is
    * set), but rounds stop as soon as NO label changed — capped at
    * `maxIters`. Returns (labels, roundsRun, stable): stable means the
    * LAST executed round was a no-op (the stable point), so the result
    * equals the fixed-iter operator at EVERY iters >= roundsRun — the
    * pinned iteration count the fixed-round spelling can't give you.
    * stable == false means the cap fired first: either a genuinely
    * deep component (raise the cap) or a synchronous-LPA oscillation
    * (bipartite structures 2-cycle forever under any synchronous rule
    * — add self-loop edges to give every node an inertia vote, which
    * makes tie-breaking monotone toward the component minimum and
    * guarantees convergence in diameter rounds). Gate cap-hit on
    * `stable`, NOT on `roundsRun < maxIters`: a run that converges
    * exactly AT the cap returns roundsRun == maxIters with
    * stable == true, and the round count alone can't tell the two
    * apart (r14 advice).
    *
    * Why it exists (r12 verdict task 7): a fixed iters=3 on a 100 TB
    * pair graph with one long path component silently under-propagates
    * — labels stop 3 hops out and the community split looks plausible.
    * Detection costs one node-sized anti-join per round against the
    * previous (localCheckpointed) labels — noise next to the round's
    * own edge join, and it BOUNDS total rounds by the actual label
    * diameter instead of a guess.
    */
  def labelPropagationConverged(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 32, weightCol: Option[String] = None,
      materialize: Boolean = true): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, "maxIters must be >= 1")
    val e0 = weightCol match {
      case Some(w) => edges.select(col("src"), col("dst"), col(w).as("_w"))
      case None    => edges.select(col("src"), col("dst"), lit(1L).as("_w"))
    }
    val e = if (materialize) e0.localCheckpoint() else e0
    var l = nodes.select(col("id"), col("id").as("label")).localCheckpoint()
    var rounds = 0
    var stable = false
    while (rounds < maxIters && !stable) {
      val votes = e.join(l.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(sum(col("_w")).as("c"))
      val pick = votes
        .groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("id"), col("m.label").as("picked"))
      // ONE job per round (r16 verdict task 5, the clusters fusion):
      // `_prev` already rides the round frame, so the LAZY checkpoint's
      // materializing action IS the stability count — the old eager
      // checkpoint + isEmpty (take-escalating over every partition
      // exactly when the round IS stable) paid 2+ jobs per round
      val next = l.join(pick, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("picked"), col("label")).as("label"),
          col("label").as("_prev"))
        .localCheckpoint(false)
      rounds += 1
      stable = next.filter(col("label") =!= col("_prev")).count() == 0L
      Blocks.free(l) // next is materialized; the previous round is dead
      l = next.select(col("id"), col("label"))
    }
    if (materialize) Blocks.free(e) // final l is a checkpoint
    (l.select(col("id"), col("label").as("community")), rounds, stable)
  }

  /** Link-prediction scores over an UNDIRECTED simple graph: for every
    * unordered node pair sharing at least one neighbor (the 2-hop
    * candidate set — never all-pairs), the common-neighbor count plus
    * neighborhood Jaccard in exact integer micro-units:
    *
    *   jacc_micro = (10⁶ · |N(a)∩N(b)|) div (|N(a)| + |N(b)| − |N(a)∩N(b)|)
    *
    * The classic "these two docs share near-dup neighbors — are THEY
    * redundant?" signal that catches pairs every pairwise hash gate
    * misses (no direct edge required).
    *
    * `edges` is (src, dst) in either orientation. Plan: canonicalize +
    * distinct, ONE degree agg, one self-join on the shared-neighbor
    * pivot (the wedge join — fan-out is Σ deg², the inherent candidate
    * count), one agg on the pair, two broadcast-friendly degree joins.
    * Skew note: a hub of degree d contributes O(d²) wedge rows; in a
    * thresholded near-dup graph d is bounded by cluster sizes, but on
    * raw power-law graphs cap hubs upstream (or sample neighbors) —
    * the same survival condition g02's orientation trick buys for
    * triangles, unavailable here because BOTH endpoints' full
    * neighborhoods define the score.
    */
  def commonNeighbors(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val full = und.select(col("a").as("id"), col("b").as("x"))
      .union(und.select(col("b").as("id"), col("a").as("x")))
    val deg = full.groupBy("id").agg(count(lit(1)).as("deg"))
    val cn = full.select(col("id").as("id_a"), col("x"))
      .join(full.select(col("id").as("id_b"), col("x")), "x")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("cn"))
    cn.join(deg.select(col("id").as("id_a"), col("deg").as("deg_a")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("deg_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("cn"), col("deg_a"), col("deg_b"),
        expr("(1000000 * cn) div (deg_a + deg_b - cn)").as("jacc_micro"))
  }
}
