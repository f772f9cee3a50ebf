package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.graftDot
import graft.ops.Num.round6

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k. The scale path is LSH bucketing
  * with random hyperplanes: sign-bit signatures → equi-join on
  * (table, bucket) so only same-bucket vectors are compared; probing
  * multiple tables recovers recall — the MinHash banding trade-off.
  *
  * Hot-path arithmetic uses [[graft.functions.DotProduct]] (a codegen'd
  * native expression — one fused loop per pair, no allocation); vector
  * norms are computed ONCE per side before any join, so the O(n²) stage
  * does exactly one dot product per pair. All accumulation is f64
  * left→right, matching the DuckDB oracle bit-for-bit.
  */
object Similarity {

  /** Cast to double once so all downstream arithmetic is f64. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Loud bound on a frame an operator is about to collect to the
    * driver or broadcast: `limit(max+1).count()` (a CollectLimit — it
    * stops scanning after max+1 rows, never a full count) and a
    * `require` with the operator's contract in the message. The
    * `domainMixture` pattern applied to the serving family: a caller
    * who passes a corpus-sized frame where a probe/query set belongs
    * gets this failure, not a driver OOM minutes later. Every caller
    * exposes the max as an overridable parameter.
    */
  private def requireBounded(df: DataFrame, max: Long, what: String, knob: String): Unit = {
    val n = df.limit((max + 1).min(Int.MaxValue).toInt).count()
    require(n <= max,
      s"$what exceeds $max rows — this side is collected/broadcast and must stay " +
      s"serving-sized (the corpus belongs on the other side); pass $knob explicitly " +
      "if a larger set is intended")
  }

  /** Rank stage shared by every top-k variant: the custom
    * [[graft.plans.TopKPerKeyNode]] operator prunes to ≤ q·k rows while
    * streaming the sorted shuffle (no window machinery over the full
    * candidate set), then row_number materializes the rank column on the
    * survivors only. The operator declares its output partitioning +
    * ordering, so the window reuses the same exchange and sort — the
    * plan has ONE shuffle for the whole stage.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    // prune to the rank columns EXPLICITLY: Catalyst can't push pruning
    // through a custom logical node, and without this the embedding
    // vectors would ride the rank shuffle
    val slim = scored.select(col("query_id"), col("neighbor_id"), col("sim"))
    val top = graft.ops.TopK.perKey(slim, Seq("query_id"),
      Seq(("sim", true), ("neighbor_id", false)), k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank").cast("long").as("rank"))
  }

  /** Interpreted-fallback helpers (higher-order functions); per-row use
    * only — the per-pair path goes through graft_dot.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k neighbors for each query vector (brute force).
    * Corpus side broadcast when small; at scale partition the corpus and
    * rely on the windowed rank's partial reduction.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(graftDot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(graftDot(col("cv"), col("cv"))))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round6(graftDot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    rankTopK(scored, k)
  }

  /** Metadata-FILTERED exact top-k — the "filtered vector search"
    * pattern every serving stack needs (top-k among candidates that
    * also satisfy a structured predicate; here: share the query's
    * label). The label equi-join IS the filter pushdown: both sides
    * co-key on the label BEFORE any similarity math, so each query
    * scores only its group — Σ group² work, never |queries|·|corpus|,
    * and a selective label prunes proportionally. Post-filtering a
    * plain top-k would instead under-fill k whenever the global
    * neighborhood is label-diverse; pre-filtering is the correct
    * semantics AND the correct plan.
    */
  def filteredTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      labelCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(labelCol).as("_lbl"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(graftDot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("_lbl"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(graftDot(col("cv"), col("cv"))))
    val scored = q.join(c, Seq("_lbl"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        round6(graftDot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    rankTopK(scored, k)
  }

  /** Linear-probe classifier inference over the embedding column — the
    * model-based quality/domain scorer every curation pipeline runs
    * after the structural filters (a fastText / logistic head distilled
    * to a weight vector): score = w·x + b, predict by sign. The weights
    * are DRIVER-side (`dim` doubles) folded into the plan as an array
    * literal — broadcast-weights inference is a narrow codegen
    * projection over the corpus, no shuffle, no join, no UDF beyond
    * the registered graft_dot expression. At 100 TB this runs at scan
    * speed and is the cheapest model-in-the-loop filter there is.
    *
    * `score` is rounded to 6 decimals BEFORE the sign test so the
    * keep/drop decision is a pure function of the gated score (the s01
    * float convention); `predicted` is 0/1 long.
    */
  def linearProbe(vectors: DataFrame, weights: Seq[Double], bias: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val w = array(weights.map(lit): _*)
    vectors.select(col(idCol),
        round6(graftDot(asDouble(col(vecCol)), w) + lit(bias)).as("score"))
      .withColumn("predicted", (col("score") > 0.0).cast("long"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009, the standard hybrid-
    * retrieval combiner): each input ranking contributes
    * `10⁶ div (kRrf + rank)` per doc, contributions sum, fused order is
    * (rrf_micro desc, id). Integer end to end, so the fused list —
    * including every tie decision — sits under the oracle gate. The
    * inputs are top-k LISTS (each `(idCol, rank)`, rank 1-based), so
    * the fusion itself is list-sized regardless of corpus scale; the
    * heavy lifting lives in the arms (BM25, ANN serving), which are
    * separately gated. `n_arms` reports how many lists surfaced the
    * doc — the agreement signal hybrid search thresholds on.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Long = 60L,
      idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 0L, "kRrf must be non-negative")
    rankings.map(_.select(col(idCol),
        expr(s"1000000 div ($kRrf + rank)").as("_c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("rrf_micro"), count(lit(1)).as("n_arms"))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
  }

  /** Hard-negative triplet mining — the contrastive-training data op
    * (anchor, positive, hard negative) a retrieval/embedding trainer
    * consumes: per anchor, the positive is its exact top-1 neighbor,
    * and the hard negative is the HIGHEST-ranked pool candidate whose
    * similarity sits at least `marginMicro` (micro-units) below the
    * positive's — close enough to be hard, far enough to dodge the
    * false-negative trap of treating a near-duplicate as a negative.
    * Anchors whose pool holds no margin-satisfying candidate emit
    * nothing (mine with a larger pool or a smaller margin).
    *
    * Scale shape: the only corpus-scale stage is the gated top-k pool
    * (brute force here; swap the LSH/IVF/PQ serving path at 100 TB by
    * passing `pool`); selection is windows over ≤ poolSize rows per
    * anchor. Integer micro-sims end to end, ties by id — the mined
    * triplets hash-match the oracle's replay.
    */
  def tripletMine(queries: DataFrame, corpus: DataFrame, poolSize: Int = 20,
      marginMicro: Long = 50000L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      pool: Option[DataFrame] = None): DataFrame = {
    require(poolSize >= 2, "poolSize must hold at least a positive and a candidate")
    require(marginMicro >= 0L, "marginMicro must be non-negative")
    val p = pool.getOrElse(bruteForceTopK(queries, corpus, poolSize, idCol, vecCol))
      .withColumn("sim_micro", round(col("sim") * 1e6, 0).cast("long"))
    val pos = p.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("pos_id"),
        col("sim_micro").as("pos_micro"))
    val wFirst = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    p.join(pos, Seq("query_id"))
      // rank > 1: at marginMicro = 0 the positive itself satisfies the
      // <= filter and would be mined as its own negative
      .filter(col("rank") > 1 && col("sim_micro") <= col("pos_micro") - marginMicro)
      .withColumn("_rn", row_number().over(wFirst))
      .filter(col("_rn") === 1)
      .select(col("query_id"), col("pos_id"), col("pos_micro"),
        col("neighbor_id").as("neg_id"), col("sim_micro").as("neg_micro"),
        col("rank").as("neg_rank"))
  }

  /** [[rrfFuse]] grouped per query — the serving-batch shape: each arm
    * is `(queryCol, idCol, rank)` top-k lists for MANY queries at once
    * (a micro-batch of the hybrid-retrieval stream), fusion and the
    * final (rrf_micro desc, id) rank happen within each query group.
    * Everything stays list-sized per query (≤ Σ arms' k candidate rows
    * per query — the window is bounded by construction, never
    * corpus-sized), so the per-batch cost is |batch|·k regardless of
    * corpus scale; the corpus-scale work lives in the arms.
    */
  def rrfFusePerQuery(rankings: Seq[DataFrame], k: Int, kRrf: Long = 60L,
      queryCol: String = "query_id", idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 0L, "kRrf must be non-negative")
    val fused = rankings.map(_.select(col(queryCol), col(idCol),
        expr(s"1000000 div ($kRrf + rank)").as("_c")))
      .reduce(_.unionByName(_))
      .groupBy(col(queryCol), col(idCol))
      .agg(sum(col("_c")).as("rrf_micro"), count(lit(1)).as("n_arms"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_micro").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) —
    * the diversified-retrieval combiner: greedily pick the candidate
    * maximizing `λ·rel − (1−λ)·max_{s∈selected} sim(c, s)`, so the
    * returned k trade relevance against redundancy (RAG context
    * assembly, dedup-at-serve-time).
    *
    * Determinism/scale contract mirrors [[rrfFuse]]: the inputs are
    * LIST-sized — `pool` is each query's candidate list
    * `(query_id, neighbor_id, sim)` from any gated top-k family
    * (brute-force here; the ANN index at 100 TB), `pairSims` its
    * pool×pool cosines — so every iteration joins tables of
    * queries×pool cardinality, independent of corpus size. Arithmetic
    * is integer end to end (λ in thousandths over micro-sims →
    * nano-scores, ties by id), so each greedy pick — including every
    * tie decision — replays exactly in the oracle's unrolled SQL.
    * `selected` is localCheckpoint'd per iteration (the d11
    * pointer-jumping pattern): without it iteration i's plan embeds
    * 2^i copies of the candidate-generation subtree.
    */
  def mmrRerank(pool: DataFrame, pairSims: DataFrame, k: Int,
      lambdaMilli: Long = 700L): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(lambdaMilli >= 0L && lambdaMilli <= 1000L,
      s"lambdaMilli is a fraction in thousandths, got $lambdaMilli")
    val rel = pool.select(col("query_id"), col("neighbor_id"),
        round(col("sim") * lit(1e6), 0).cast("long").as("rel_micro"))
      .localCheckpoint()
    val pairs = pairSims.select(col("query_id"), col("a"), col("b"),
        col("pair_micro")).localCheckpoint()
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_nano").desc, col("neighbor_id"))
    // first pick: pure relevance (no selected set to be redundant with)
    var selected = rel
      .withColumn("mmr_nano", lit(lambdaMilli) * col("rel_micro"))
      .withColumn("_rn", row_number().over(wPick)).filter(col("_rn") === 1)
      .select(col("query_id"), col("neighbor_id"),
        lit(1L).as("mmr_rank"), col("rel_micro"), col("mmr_nano"))
      .localCheckpoint()
    for (i <- 2 to k) {
      val selIds = selected.select(col("query_id").as("_sq"),
        col("neighbor_id").as("_sid"))
      val maxPair = pairs
        .join(selIds, col("query_id") === col("_sq") && col("b") === col("_sid"))
        .groupBy(col("query_id").as("_mq"), col("a"))
        .agg(max(col("pair_micro")).as("_max_pair"))
      // LEFT join + coalesce(0), not inner: a pool candidate with no
      // pairSims entry against any selected item scores with ZERO
      // redundancy rather than silently dropping out of consideration —
      // mmrTopK's pool-cross-pool pairs are complete so both joins
      // agree there, but a caller passing sparse/thresholded pair sims
      // would otherwise get a shrunken candidate set the hash gate
      // can't see (the t31 LEFT-join-plus-coalesce hazard)
      val pick = rel
        .join(selIds, col("query_id") === col("_sq") &&
          col("neighbor_id") === col("_sid"), "left_anti")
        .join(maxPair, col("query_id") === col("_mq") &&
          col("neighbor_id") === col("a"), "left")
        .withColumn("mmr_nano", lit(lambdaMilli) * col("rel_micro") -
          lit(1000L - lambdaMilli) * coalesce(col("_max_pair"), lit(0L)))
        .withColumn("_rn", row_number().over(wPick)).filter(col("_rn") === 1)
        .select(col("query_id"), col("neighbor_id"),
          lit(i.toLong).as("mmr_rank"), col("rel_micro"), col("mmr_nano"))
      val next = selected.unionByName(pick).localCheckpoint()
      // next is materialized: the previous iteration's checkpoint (and,
      // after the last pick, the pinned rel/pairs inputs) are dead
      // weight — free per the [[graft.ops.Blocks]] one-live-checkpoint
      // contract
      graft.ops.Blocks.free(selected)
      selected = next
    }
    graft.ops.Blocks.free(rel)
    graft.ops.Blocks.free(pairs)
    selected.orderBy(col("query_id"), col("mmr_rank"))
  }

  /** [[mmrRerank]] over a brute-force candidate pool: generates each
    * query's `poolSize` exact-cosine candidates (the only corpus-scale
    * stage — swap in the LSH/IVF/PQ serving path at scale), computes
    * the pool's pairwise cosines (queries × pool² rows, broadcast-
    * joined vectors), and greedily diversifies to k. Pair sims carry
    * the same round(6)→micro convention as the relevance scores.
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      poolSize: Int = 20, lambdaMilli: Long = 700L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val pool = bruteForceTopK(queries, corpus, poolSize, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val vecs = corpus.select(col(idCol).as("_vid"),
        asDouble(col(vecCol)).as("_vv"))
      .withColumn("_vn", sqrt(graftDot(col("_vv"), col("_vv"))))
    val cand = pool.join(vecs, col("neighbor_id") === col("_vid"))
      .select(col("query_id"), col("neighbor_id"), col("_vv"), col("_vn"))
    val x = cand.select(col("query_id"), col("neighbor_id").as("a"),
      col("_vv").as("_av"), col("_vn").as("_an"))
    val y = cand.select(col("query_id").as("_yq"), col("neighbor_id").as("b"),
      col("_vv").as("_bv"), col("_vn").as("_bn"))
    val pairs = x.join(y, col("query_id") === col("_yq") && col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        round(round6(graftDot(col("_av"), col("_bv")) / (col("_an") * col("_bn")))
          * lit(1e6), 0).cast("long").as("pair_micro"))
    mmrRerank(pool, pairs, k, lambdaMilli)
  }

  /** Exact cosine top-k over the first `dPrime` dimensions only — the
    * Matryoshka/truncated-embedding serving pattern (Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS'22): embeddings
    * trained front-loaded can be sliced to a prefix and re-normalized,
    * cutting both the flops AND the bytes of the scoring join by
    * d′/d while keeping neighbor quality. The slice happens BEFORE the
    * pair join, so only d′-element arrays ever enter the O(n·q) stage
    * — at 100 TB the corpus side ships d′/d of the data it otherwise
    * would. Exact within the truncated space (it IS brute force over
    * the sliced vectors), which is what the s09 oracle replays.
    */
  def truncatedTopK(queries: DataFrame, corpus: DataFrame, k: Int, dPrime: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def trunc(df: DataFrame) =
      df.select(col(idCol), slice(col(vecCol), 1, dPrime).as(vecCol))
    bruteForceTopK(trunc(queries), trunc(corpus), k, idCol, vecCol)
  }

  /** Two-stage truncated-then-rerank serving: a WIDE candidate pool
    * (`candidates` ≥ k per query) ranked cheaply in the d′-dim prefix
    * space, then ONE exact full-dimension pass over just those
    * candidates. Per query the full-width vectors are touched
    * `candidates` times instead of |corpus| times — the standard
    * coarse-to-fine serving shape (same economics as IVF/PQ + rerank,
    * but with no trained structure to maintain: the "index" is the
    * embedding layout itself). Output matches [[bruteForceTopK]]
    * whenever the truncated space's top-`candidates` contains the true
    * top-k — a property of PREFIX-TRAINED embeddings; in the
    * saturation limit `candidates == |corpus|` the match is
    * unconditional (pinned in ExtSpec). The registered s10 row gates
    * the two-stage computation itself cross-engine: the oracle replays
    * candidate selection AND rerank, tie orders included.
    */
  def truncatedRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dPrime: Int, candidates: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastRows: Long = 4194304L): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    // the candidate list (|queries|·candidates id pairs) is broadcast
    // below; bound the query side so a corpus passed as the query frame
    // fails loudly instead of shipping a corpus-sized broadcast
    requireBounded(queries, (maxBroadcastRows / candidates.toLong).max(1L),
      s"truncatedRerankTopK query set (×$candidates candidates each, broadcast)",
      "maxBroadcastRows")
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val cand = truncatedTopK(queries, corpus, candidates, dPrime, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val q = normedSide(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = normedSide(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    // candidate list is |queries|·candidates rows of two longs — it
    // broadcasts; the full-width corpus streams through one hash join,
    // and the query join's left side is already candidate-sized
    val scored = broadcast(cand).join(c, Seq("neighbor_id")).join(q, Seq("query_id"))
      .withColumn("sim", round6(graftDot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    rankTopK(scored, k)
  }

  /** Deterministic ±1.0 for input dim `j`, output dim `k`, `seed` —
    * md5-parity so both engines (and the oracle SQL generator) derive
    * the identical sign matrix from the three integers alone.
    */
  def projectionSign(j: Int, k: Int, seed: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$j:$k:$seed".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((d(0) & 1) == 0) 1.0 else -1.0
  }

  /** Sign matrix for [[randomProjection]]: `outDim` rows of `inDim`
    * ±1 entries (Achlioptas 2001 — database-friendly random
    * projections: ±1 signs satisfy the JL lemma like gaussians do, and
    * the projection becomes signed sums).
    */
  def projectionSigns(inDim: Int, outDim: Int, seed: Long): Seq[Seq[Double]] =
    (0 until outDim).map(k => (0 until inDim).map(j => projectionSign(j, k, seed)))

  /** Johnson-Lindenstrauss sparse random projection: embed `inDim`
    * vectors into `outDim` dims as signed sums `p_k = Σ_j s(j,k)·v_j`,
    * the DATA-INDEPENDENT dimensionality reduction (works on any
    * embedding, unlike the s09 Matryoshka prefix slice which needs
    * truncation-trained vectors). Distances are preserved within the
    * JL distortion bound up to the constant `√outDim` (callers
    * comparing to original distances divide once; rankings don't
    * care). The sign matrix is driver-side config (outDim·inDim ±1s
    * folded into the plan as array literals — the s11 broadcast-
    * weights shape), so the projection is `outDim` fused codegen dots
    * per row: a narrow scan-speed pass, no shuffle, no UDF. Output is
    * (id, proj_dim, proj) rows with proj rounded to 6 (the s01 float
    * convention) — the s17 gate replays every value via
    * `list_dot_product` on the same literals.
    */
  def randomProjection(vectors: DataFrame, outDim: Int, seed: Long,
      inDim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(outDim > 0 && inDim > 0, "dims must be positive")
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val signs = projectionSigns(inDim, outDim, seed)
    val v = asDouble(col(vecCol))
    vectors.select(col(idCol), posexplode(array(signs.map(s =>
        round6(graftDot(v, typedLit(s.toArray)))): _*))
      .as(Seq("proj_dim", "proj")))
  }

  /** Projected column helper: the `outDim`-wide projected vector (no
    * rounding — stage-1 scoring rounds its final cosine instead, the
    * s09/s10 convention) for [[projectedRerankTopK]].
    */
  private def projectedVec(vecCol: Column, inDim: Int, outDim: Int,
      seed: Long): Column = {
    val v = asDouble(vecCol)
    array(projectionSigns(inDim, outDim, seed)
      .map(s => graftDot(v, typedLit(s.toArray))): _*)
  }

  /** Coarse-to-fine serving through the JL projection: stage 1 ranks
    * candidates by cosine in the `outDim`-projected space (the cheap
    * pass touches outDim/inDim of the bytes per pair — the s10 rerank
    * economics without needing Matryoshka-trained embeddings), stage 2
    * re-scores the `candidates` survivors with full-width vectors.
    * Both stages round(6) before ranking, ties by id, so the whole
    * cascade is a pure function of gated scores and the s18 oracle
    * replays it end to end. The candidate list broadcasts
    * (|queries|·candidates id pairs) under the same loud bound as
    * [[truncatedRerankTopK]].
    */
  def projectedRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      outDim: Int, seed: Long, candidates: Int, inDim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastRows: Long = 4194304L): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    requireBounded(queries, (maxBroadcastRows / candidates.toLong).max(1L),
      s"projectedRerankTopK query set (×$candidates candidates each, broadcast)",
      "maxBroadcastRows")
    GraftFunctions.ensureRegistered(queries.sparkSession)
    def projSide(df: DataFrame) = df.select(col(idCol),
      projectedVec(col(vecCol), inDim, outDim, seed).as("embedding"))
    val cand = bruteForceTopK(projSide(queries), projSide(corpus), candidates,
        idCol, "embedding")
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(graftDot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(graftDot(col("cv"), col("cv"))))
    val scored = broadcast(cand).join(c, Seq("neighbor_id")).join(q, Seq("query_id"))
      .withColumn("sim", round6(graftDot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    rankTopK(scored, k)
  }

  /** Random-hyperplane LSH signature: `bits` sign bits. Hyperplanes are
    * seeded gaussian literal arrays evaluated through the native dot
    * product (codegen'd — the signature of a billion vectors is `bits`
    * fused loops per row, no per-element lambda dispatch).
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val v = asDouble(vec)
    val bitCols = (0 until bits).map { i =>
      val rnd = new scala.util.Random(seed * 7919L + i)
      val plane = Array.fill(dim)(rnd.nextGaussian())
      when(graftDot(v, typedLit(plane)) > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** Shared hyperplane-LSH bucketing stage: (id, vec-as-double, norm)
    * exploded once per hash table with its (table, bucket) key — the
    * single copy of the bucketing recipe [[lshTopK]] and
    * [[cosineDupPairsLsh]] both join on.
    */
  private def lshBucketed(df: DataFrame, dim: Int, bitsPerTable: Int, tables: Int,
      seedBase: Long, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String): DataFrame = {
    val base = df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))
      .withColumn(normAs, sqrt(graftDot(col(vecAs), col(vecAs))))
    val tableCols = (0 until tables).map(t =>
      struct(lit(t).as("table"),
        hyperplaneSignature(col(vecAs), dim, bitsPerTable, seed = seedBase + t).as("bucket")))
    base.select(col(idAs), col(vecAs), col(normAs), explode(array(tableCols: _*)).as("tb"))
      .select(col(idAs), col(vecAs), col(normAs),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** The (id, vec, norm, table, bucket) hyperplane-LSH bucket rows for a
    * vector corpus — the embedding twin of
    * [[graft.ext.Dedup.minhashIndex]]: computable once and PERSISTED
    * (parquet via [[writeLshIndex]]) so ANN serving and ingest dedup
    * probe an artifact instead of re-hashing the corpus per call.
    * `(dim, bitsPerTable, tables, seedBase)` must match between index
    * build and probe time — the hyperplanes are a pure function of them,
    * and a mismatch hashes the two sides with UNRELATED planes. That
    * failure is SILENT and wrong, not empty: bucket values are dense
    * small integers, so mismatched sides still collide by chance and
    * the probe returns random candidates. Hence the `_graft_lsh_params`
    * sidecar [[writeLshIndex]] records and [[lshTopKAt]] obeys —
    * parameter agreement is enforced by construction, not by docstring.
    */
  def lshIndex(vectors: DataFrame, dim: Int, bitsPerTable: Int = 8, tables: Int = 8,
      seedBase: Long = 2000L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    lshBucketed(vectors, dim, bitsPerTable, tables, seedBase, idCol, vecCol,
      "id", "vec", "norm")
  }

  /** The hash parameters an LSH index was built with. The hyperplanes
    * are a pure function of these four values, so a probe MUST hash with
    * the same ones — a mismatch buckets the two sides incompatibly and
    * the (table, bucket) join silently matches nothing.
    */
  case class LshParams(dim: Int, bitsPerTable: Int, tables: Int, seedBase: Long)

  /** Persist [[lshIndex]] as parquet, repartitioned on the probe join's
    * (table, bucket) key so bucket reads are co-located. The hash
    * parameters are written alongside as an `_graft_lsh_params.json`
    * sidecar (underscore-prefixed, so parquet readers skip it like
    * `_SUCCESS`) — probes read them back with [[readLshIndexParams]]
    * instead of trusting call-site defaults to agree.
    */
  def writeLshIndex(vectors: DataFrame, path: String, dim: Int,
      bitsPerTable: Int = 8, tables: Int = 8, seedBase: Long = 2000L,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    lshIndex(vectors, dim, bitsPerTable, tables, seedBase, idCol, vecCol)
      .repartition(col("table"), col("bucket"))
      .write.mode("overwrite").parquet(path)
    writeLshParams(vectors.sparkSession, path,
      LshParams(dim, bitsPerTable, tables, seedBase))
  }

  private def paramsPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_graft_lsh_params.json")

  private[ext] def writeLshParams(spark: org.apache.spark.sql.SparkSession,
      path: String, p: LshParams): Unit = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val out = fs.create(paramsPath(path), true)
    try out.write(
      s"""{"dim":${p.dim},"bitsPerTable":${p.bitsPerTable},"tables":${p.tables},"seedBase":${p.seedBase}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The [[LshParams]] sidecar of a persisted index; None for an index
    * written before the sidecar existed (or by hand).
    */
  def readLshIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[LshParams] = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    if (!fs.exists(paramsPath(path))) return None
    val in = fs.open(paramsPath(path))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(k: String) = s""""$k":(-?[0-9]+)""".r.findFirstMatchIn(txt).map(_.group(1))
    for {
      d <- field("dim"); b <- field("bitsPerTable")
      t <- field("tables"); s <- field("seedBase")
    } yield LshParams(d.toInt, b.toInt, t.toInt, s.toLong)
  }

  /** Read a persisted [[lshIndex]] back (reload==recompute pinned in
    * ExtSpec); pass to [[lshTopK]]'s `corpusIndex` or
    * [[cosineDupPairsNewLsh]] — with the SAME seedBase the sidecar
    * records ([[readLshIndexParams]] / [[lshTopKAt]] make that
    * automatic).
    */
  def readLshIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental maintenance of a persisted [[lshIndex]]: bucket an
    * ingest batch with the LIVE sidecar's hyperplanes (the only ones
    * the existing rows were hashed with), drop stale rows of
    * re-ingested ids, and promote kept ∪ fresh through the
    * fuse-guarded [[IndexLifecycle.swapIn]] — a vector upsert costs
    * batch-side hashing plus one merge write, never a corpus re-hash.
    * `update == rebuild` over the grown corpus is pinned in ExtSpec.
    */
  def updateLshIndex(spark: org.apache.spark.sql.SparkSession,
      newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val p = readLshIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_lsh_params.json sidecar — not an index this can update"))
    val kept = readLshIndex(spark, path)
      .join(newVectors.select(col(idCol).as("id")), Seq("id"), "left_anti")
    val fresh = lshIndex(newVectors, p.dim, p.bitsPerTable, p.tables, p.seedBase,
      idCol, vecCol)
    val rebuild = s"${path}_rebuild"
    kept.unionByName(fresh)
      .repartition(col("table"), col("bucket"))
      .write.mode("overwrite").parquet(rebuild)
    writeLshParams(spark, rebuild, p)
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Deletion propagation for a persisted [[lshIndex]]: the embedding
    * VECTORS of taken-down ids live verbatim in the index rows, so a
    * takedown must purge them — drop every row of the forgotten ids and
    * swap the purged build in. `forget == rebuild(minus ids)` is pinned
    * in ExtSpec.
    */
  def forgetLshIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, forgetIds: DataFrame, idCol: String = "vec_id"): Unit = {
    val p = readLshIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_lsh_params.json sidecar — not an index this can update"))
    val rebuild = s"${path}_rebuild"
    readLshIndex(spark, path)
      .join(forgetIds.select(col(idCol).as("id")), Seq("id"), "left_anti")
      .repartition(col("table"), col("bucket"))
      .write.mode("overwrite").parquet(rebuild)
    writeLshParams(spark, rebuild, p)
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** [[lshTopK]] against a persisted index path, hash parameters taken
    * from the index's own sidecar — the footgun-free serving call (no
    * way to probe with mismatched planes). Requires the sidecar.
    */
  def lshTopKAt(spark: org.apache.spark.sql.SparkSession, queries: DataFrame,
      k: Int, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    val p = readLshIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_lsh_params.json sidecar; pass parameters to lshTopK explicitly"))
    lshTopKIndexed(queries, readLshIndex(spark, path), k, p, idCol, vecCol,
      broadcastQueries)
  }

  /** Approximate top-k: compare only vectors sharing an LSH bucket in at
    * least one of `tables` hash tables, then exact cosine + rank within
    * the candidate set. ONE `seedBase` drives both the query-side
    * hashing and the inline corpus path, so the two sides cannot bucket
    * incompatibly; with `corpusIndex` the corpus side is a persisted
    * [[lshIndex]] — it must have been built with the SAME
    * (dim, bitsPerTable, tables, seedBase), which [[lshTopKAt]]
    * guarantees by reading them from the index's sidecar — and the
    * per-call work is hashing only the probe set.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      bitsPerTable: Int = 12, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true,
      corpusIndex: Option[DataFrame] = None,
      seedBase: Long = 1000L): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = lshBucketed(queries, dim, bitsPerTable, tables, seedBase, idCol, vecCol,
      "query_id", "qv", "qn")
    val c = corpusIndex match {
      case Some(idx) => idx.select(col("id").as("neighbor_id"), col("vec").as("cv"),
        col("norm").as("cn"), col("table"), col("bucket"))
      case None => lshBucketed(corpus, dim, bitsPerTable, tables, seedBase, idCol, vecCol,
        "neighbor_id", "cv", "cn")
    }
    probeRank(q, c, k, broadcastQueries)
  }

  /** [[lshTopK]] with the corpus side given ONLY as a persisted-index
    * DataFrame and the hash parameters as an explicit [[LshParams]] —
    * the serving-layer entry point ([[lshTopKAt]] and the streaming
    * server build on it; no raw-corpus argument to confuse with the
    * index).
    */
  def lshTopKIndexed(queries: DataFrame, corpusIndex: DataFrame, k: Int,
      p: LshParams, idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = lshBucketed(queries, p.dim, p.bitsPerTable, p.tables, p.seedBase,
      idCol, vecCol, "query_id", "qv", "qn")
    val c = corpusIndex.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      col("norm").as("cn"), col("table"), col("bucket"))
    probeRank(q, c, k, broadcastQueries)
  }

  /** Bucket-join the hashed probe side against a bucketed corpus side,
    * exact-cosine the candidates, rank top-k — the stage every LSH
    * serving variant shares.
    */
  private def probeRank(q: DataFrame, c: DataFrame, k: Int,
      broadcastQueries: Boolean): DataFrame = {
    // a small probe set broadcasts so the corpus never shuffles for the
    // bucket join; for corpus-vs-corpus self-search pass
    // broadcastQueries=false to fall back to a shuffle join
    val qSide = if (broadcastQueries) broadcast(q) else q
    val cand = c.join(qSide, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("sim",
      round6(graftDot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    rankTopK(scored, k)
  }

  /** IVF-style approximate top-k: a coarse quantizer (deterministic
    * hash-ordered sample of the corpus as centroids) partitions the
    * corpus into inverted lists; each query probes its `nProbe` nearest
    * centroids and runs exact cosine only inside those lists.
    *
    * The codebook (nCentroids vectors) is collected to the driver — the
    * same footprint any ANN index's coarse quantizer has — so list
    * assignment is a NARROW per-row argmax over centroid literals: no
    * cross join, no shuffle, embedded straight into the scan's codegen.
    * The candidate join broadcasts the probe side; the corpus shuffles
    * only for the final per-query ranking. Classic IVF trade-off: scan
    * nProbe/nCentroids of the corpus.
    *
    * SCALE SHAPE (why the bench's `ivf_serve` per-row ratio floors
    * near 0.6 while the rest of the serving family reads ~0.3): with
    * `corpusIndex = None` every call pays TWO whole-corpus passes —
    * the codebook TakeOrdered and the list-assignment projection —
    * before any serving work, so the ×1 run is compute-bound rather
    * than job-overhead-bound. The probe ratio t(×k)/(k·t(×1)) then
    * tends to (k·c + o)/(k·(c + o)) → 1 as the linear per-unit cost c
    * dominates the fixed overhead o, NOT because any stage is
    * super-linear: the measured marginal cost is flat (0.27 s per
    * corpus unit over ×1→×10 vs 0.25 over ×10→×20 on the sf0.1
    * fixtures). The production serving path passes a prebuilt
    * `corpusIndex` ([[writeIvfIndex]]), amortizing both corpus passes
    * across query batches — the bench's `ivf_serve_indexed` arm
    * measures exactly that and is the number to compare against the
    * other serving arms.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastProbes: Boolean = true,
      corpusIndex: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    // with a persisted index the per-call work is hashing only the probe
    // set: the codebook parquet is the 16-row quantizer, the lists
    // parquet the pre-assigned corpus. nCentroids is then defined by the
    // index (the parameter is ignored); nProbe must be <= its size.
    val (codebook, corpusLists) = corpusIndex match {
      case Some((cb, lists)) =>
        (cb.collect(),
          lists.select(col("id").as("neighbor_id"), col("vec").as("cv"),
            col("norm").as("cn"), col("centroid_id")))
      case None =>
        val (cbDf, lists) = ivfIndex(corpus, nCentroids, idCol, vecCol)
        (cbDf.collect(),
          lists.select(col("id").as("neighbor_id"), col("vec").as("cv"),
            col("norm").as("cn"), col("centroid_id")))
    }
    def nearestCentroids(vec: String, nrm: String, keep: Int): Column =
      nearestCentroidsExpr(codebook, vec, nrm, keep)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(graftDot(col("qv"), col("qv"))))
    val probes = q.withColumn("probe",
        explode(nearestCentroids("qv", "qn", nProbe)))
      .select(col("query_id"), col("qv"), col("qn"),
        col("probe.centroid_id").as("centroid_id"))
    // corpus keep=1 + distinct probe centroids ⇒ a (query, neighbor) pair
    // can only arise once: no dedupe shuffle needed. Probe broadcast is
    // the default for small query sets; disable for corpus-vs-corpus.
    val probeSide = if (broadcastProbes) broadcast(probes) else probes
    val cand = corpusLists.join(probeSide, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val scored = cand.withColumn("sim",
      round6(graftDot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    rankTopK(scored, k)
  }

  /** Persistable IVF index for a vector corpus: (codebook, lists).
    * codebook = the `nCentroids` hash-ordered corpus rows that act as
    * the coarse quantizer ((id, vec, norm) — deterministic: first
    * nCentroids by xxhash64(id)); lists = every corpus row with its
    * nearest-centroid assignment (the inverted lists). Persist with
    * [[writeIvfIndex]] so ANN serving pays the corpus assignment ONCE —
    * per query batch only the probe side is hashed ([[ivfTopK]] with
    * `corpusIndex`). The index keys the FAISS-style serving layout:
    * lists parquet laid out on centroid_id, so a probe reads only its
    * nProbe/nCentroids fraction of the corpus.
    */
  def ivfIndex(corpus: DataFrame, nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val codebookDf = c.orderBy(xxhash64(col("id"))).limit(nCentroids)
    val cbRows = codebookDf.collect()
    val lists = c.withColumn("centroid_id",
      element_at(nearestCentroidsExpr(cbRows, "vec", "norm", 1), 1).getField("centroid_id"))
    (codebookDf, lists)
  }

  /** [[ivfIndex]] built on a TRAINED codebook ([[trainCodebook]])
    * instead of a hash-sampled one — Lloyd's pulls centroids toward
    * the corpus's actual density, so the inverted lists are tighter
    * and a probe budget recovers more of the true neighbors. Emits the
    * exact [[ivfIndex]] shapes ((id, vec, norm) codebook + assigned
    * lists), so [[writeIvfIndex]]-style persistence, [[ivfTopK]]'s
    * `corpusIndex`, and the IndexLifecycle rebuild/swap machinery all
    * apply unchanged.
    */
  def ivfIndexTrained(corpus: DataFrame, nCentroids: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val codebookDf = codebookVectors(
        trainCodebook(corpus, nCentroids, iters, idCol, vecCol))
      .select(col("centroid_id").as("id"), col("centroid").as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val lists = c.withColumn("centroid_id",
      element_at(nearestCentroidsExpr(codebookDf.collect(), "vec", "norm", 1), 1)
        .getField("centroid_id"))
    (codebookDf, lists)
  }

  /** Persist [[ivfIndex]] as parquet: `path/codebook` + `path/lists`
    * (lists repartitioned on centroid_id — the probe join's key).
    */
  def writeIvfIndex(corpus: DataFrame, path: String, nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    writeIvfIndexParts(ivfIndex(corpus, nCentroids, idCol, vecCol), path)

  /** Persist an already-built (codebook, lists) pair — [[ivfIndex]] or
    * [[ivfIndexTrained]] — in the [[writeIvfIndex]] layout.
    */
  def writeIvfIndexParts(index: (DataFrame, DataFrame), path: String): Unit = {
    val (cb, lists) = index
    cb.write.mode("overwrite").parquet(s"$path/codebook")
    lists.repartition(col("centroid_id")).write.mode("overwrite").parquet(s"$path/lists")
  }

  /** Read a persisted [[ivfIndex]] back; pass to [[ivfTopK]]'s
    * `corpusIndex` (indexed == inline pinned in ExtSpec).
    */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/codebook"), spark.read.parquet(s"$path/lists"))

  /** Assign vectors to their nearest centroid of an EXISTING codebook —
    * the list-side computation of [[ivfIndex]] factored out so
    * incremental maintenance can reuse a live coarse quantizer. The
    * codebook collects to a literal argmax (k·dim driver state, the
    * documented bounded-collect pattern of this file) and assignment is
    * one narrow codegen pass over the batch.
    */
  def ivfAssign(vectors: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val c = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    c.withColumn("centroid_id",
      element_at(nearestCentroidsExpr(codebook.collect(), "vec", "norm", 1), 1)
        .getField("centroid_id"))
  }

  /** Incremental maintenance of a persisted [[ivfIndex]]: assign the
    * ingest batch against the LIVE codebook, drop stale list rows of
    * re-ingested ids, and promote (same codebook, kept ∪ fresh lists)
    * through the fuse-guarded [[IndexLifecycle.swapIn]]. The codebook
    * deliberately does NOT retrain on upsert — the coarse quantizer
    * answers "as of train time", and membership changes are exactly
    * what the lists absorb; rebuild ([[IndexLifecycle.rebuildIvfIndex]])
    * when the vector DISTRIBUTION drifts enough that list balance
    * degrades (the FAISS operational convention). `update ==
    * (live codebook, reassign(grown))` is pinned in IndexLifecycleSpec.
    */
  def updateIvfIndex(spark: org.apache.spark.sql.SparkSession,
      newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val (cb, lists) = readIvfIndex(spark, path)
    val kept = lists.join(newVectors.select(col(idCol).as("id")), Seq("id"), "left_anti")
    val fresh = ivfAssign(newVectors, cb, idCol, vecCol)
    val rebuild = s"${path}_rebuild"
    cb.write.mode("overwrite").parquet(s"$rebuild/codebook")
    kept.unionByName(fresh)
      .repartition(col("centroid_id"))
      .write.mode("overwrite").parquet(s"$rebuild/lists")
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Deletion propagation for a persisted [[ivfIndex]]: list rows carry
    * the raw vectors of their ids, so a takedown must purge them; the
    * codebook keeps serving (its centroids are corpus-derived summary
    * state, and a forgotten id that seeded a hash-sampled centroid
    * leaves only a cluster anchor, not recoverable content — retrain
    * via rebuild if policy demands even that). `forget ==
    * (live codebook, lists minus ids)` is pinned in IndexLifecycleSpec.
    */
  def forgetIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, forgetIds: DataFrame, idCol: String = "vec_id"): Unit = {
    val (cb, lists) = readIvfIndex(spark, path)
    val rebuild = s"${path}_rebuild"
    cb.write.mode("overwrite").parquet(s"$rebuild/codebook")
    lists.join(forgetIds.select(col(idCol).as("id")), Seq("id"), "left_anti")
      .repartition(col("centroid_id"))
      .write.mode("overwrite").parquet(s"$rebuild/lists")
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Nearest `keep` centroids of a collected codebook as a sorted
    * literal-array argmax — narrow, codegen'd, embedded straight into
    * the scan (no cross join). ASCENDING sort on (-csim, centroid_id)
    * keeps ties on the SMALLEST centroid id; `lit(r.get(0))` keeps the
    * id column type-generic. With `rounded` the ordering key is
    * round(csim, 6) — the cross-engine-stable comparison an ORACLE
    * replays (the s01 rank pattern); the unrounded form stays the
    * internal IVF default.
    */
  private def nearestCentroidsExpr(codebook: Array[org.apache.spark.sql.Row],
      vec: String, nrm: String, keep: Int, rounded: Boolean = false): Column = {
    val sims = codebook.map { r =>
      val cv = r.getSeq[Double](1).toArray
      val cn = r.getDouble(2)
      val csim = graftDot(col(vec), typedLit(cv)) / (col(nrm) * lit(cn))
      struct((-(if (rounded) round6(csim) else csim)).as("negsim"),
        lit(r.get(0)).as("centroid_id"))
    }
    slice(sort_array(array(sims.toIndexedSeq: _*), asc = true), 1, keep)
  }

  /** SemDeDup-style semantic near-dup pairs: coarse-cluster the corpus
    * (argmax cosine against an md5-ordered deterministic codebook of
    * `nCentroids` corpus rows), then compare pairs ONLY within a
    * cluster and keep exact cosine ≥ minSim. This is the standard
    * embedding-dedup scale pattern: the quadratic stage shrinks from
    * n² to Σ cluster², and IDENTICAL vectors provably agree on their
    * nearest centroid (same rounded sims, same tie-break), so
    * exact-duplicate recall is 1.0. Near-identical pairs agree except
    * when they straddle a cluster BOUNDARY — the recall trade-off real
    * SemDeDup makes too (mitigate with more/fewer centroids or an LSH
    * pass, [[cosineDupPairsLsh]], for boundary-sensitive thresholds).
    * Pairs are a SUBSET of [[cosineDupPairs]]'s by construction — the
    * trade the operator makes explicit. md5 (not xxhash64) codebook ordering + round(6)
    * assignment comparisons make the whole operator — clustering
    * included — replayable by a SQL oracle (the s04 gate).
    */
  def semanticDupPairs(vectors: DataFrame, minSim: Double, nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      joinAssign: Boolean = false): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val c = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val cbDf = c.orderBy(graft.functions.Cols.md5Uint32(col("id").cast("string")), col("id"))
      .limit(nCentroids)
    // assignment: the literal-codebook expression (narrow, codegen'd,
    // zero joins) is right while the codebook fits an expression tree —
    // up to a few hundred centroids. Real SemDeDup at corpus scale runs
    // ~10^4–10^5 clusters: `joinAssign` switches to a broadcast join +
    // min_by argmax over the SAME rounded ordering key, identical
    // output (twin-equality pinned in ExtSpec), O(n·k) work distributed
    // instead of an O(k) expression per row on the driver's plan.
    val assigned =
      if (joinAssign) {
        val cb = broadcast(cbDf.select(col("id").as("cid"),
          col("vec").as("cv"), col("norm").as("cn")))
        c.join(cb)
          .withColumn("negsim",
            -round6(graftDot(col("vec"), col("cv")) / (col("norm") * col("cn"))))
          .groupBy(col("id"), col("vec"), col("norm"))
          .agg(min(struct(col("negsim"), col("cid"))).getField("cid").as("centroid_id"))
      } else {
        c.withColumn("centroid_id",
          element_at(nearestCentroidsExpr(cbDf.collect(), "vec", "norm", 1, rounded = true), 1)
            .getField("centroid_id"))
      }
    val a = assigned.select(col("centroid_id"), col("id").as("id_a"),
      col("vec").as("va"), col("norm").as("na"))
    val b = assigned.select(col("centroid_id"), col("id").as("id_b"),
      col("vec").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b") && pairSim >= minSim)
      .select(col("id_a"), col("id_b"), round6(pairSim).as("sim"))
  }

  /** Per-dimension first-moment summary of an embedding corpus —
    * `(pos, cnt, msum)` with `msum = Σ floor(x·1e6)` EXACT integers
    * (the trainCodebook state convention: long sums are
    * order-independent across engines and shuffle orders). ONE
    * posexplode + map-side-combined groupBy on pos; output is dim
    * rows regardless of corpus size — the cheapest distribution
    * fingerprint there is, and the input to [[embeddingDrift]].
    */
  def embeddingMoments(vectors: DataFrame, vecCol: String = "embedding"): DataFrame =
    vectors.select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(count(lit(1)).as("cnt"), sum(floor(col("x") * 1e6).cast("long")).as("msum"))

  /** Per-dimension mean drift between two [[embeddingMoments]] frames —
    * the operational "when to rebuild" signal the index lifecycle
    * documents (codebooks/planes answer "as of train time"; rebuild
    * when the vector DISTRIBUTION drifts): compare the moments sidecar
    * captured at index-build time against the moments of recent
    * ingest, and trigger [[IndexLifecycle]] rebuilds when `dmean`
    * exceeds the corpus's tolerance. Means derive as ONE IEEE division
    * of exact integers rounded to 6 (the s01 float convention), so the
    * whole report — dim rows, joins at dim cardinality — replays in a
    * SQL oracle. Output: (pos, cnt_before, cnt_after, mean_before,
    * mean_after, dmean).
    */
  def embeddingDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("pos"), col("cnt").as("cnt_before"),
      col("msum").as("msum_before"))
    val a = after.select(col("pos"), col("cnt").as("cnt_after"),
      col("msum").as("msum_after"))
    b.join(a, Seq("pos"))
      .select(col("pos").cast("long").as("pos"),
        col("cnt_before"), col("cnt_after"),
        round6(col("msum_before") / (col("cnt_before") * 1e6)).as("mean_before"),
        round6(col("msum_after") / (col("cnt_after") * 1e6)).as("mean_after"))
      .withColumn("dmean", round6(col("mean_after") - col("mean_before")))
  }

  /** Scalar worst-case drift of an [[embeddingDrift]] report — the
    * dim-row driver reduction an ingest job thresholds on
    * (`if (maxAbsDrift(...) > tol) IndexLifecycle.rebuild...`).
    */
  def maxAbsDrift(drift: DataFrame): Double =
    drift.agg(max(abs(col("dmean")))).head().getDouble(0)

  /** Persist the corpus's [[embeddingMoments]] next to a vector index —
    * `<path>/_graft_moments` (underscore-prefixed, so index readers
    * skip it like `_SUCCESS`/the params sidecars). Recorded by the
    * [[IndexLifecycle]] rebuilds so ingest can ask "has the
    * distribution drifted since this index was trained?"
    * ([[IndexLifecycle.driftSinceBuild]]) without keeping the build
    * corpus around. Dim rows — one file.
    */
  def writeMomentsSidecar(vectors: DataFrame, path: String,
      vecCol: String = "embedding"): Unit =
    embeddingMoments(vectors, vecCol).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_graft_moments")

  /** The [[writeMomentsSidecar]] frame of an index; None for an index
    * built before the sidecar existed.
    */
  def readMomentsSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_moments")
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Rounded-cosine nearest-centroid assignment against a
    * [[trainCodebook]] STATE frame — the s04/s05 assignment key
    * (round-6 cosine, ties to the smallest centroid id), so the
    * assignment replays exactly in a SQL oracle; [[ivfAssign]]'s raw
    * ordering is for serving lists, this one is for gate-stable
    * cluster semantics (mixture construction, cluster-balanced
    * sampling). Codebook state is driver-side k·dim integer rows, the
    * documented bounded-collect pattern; assignment is one narrow
    * codegen pass. Output: (idCol, centroid_id).
    */
  def assignToCodebook(vectors: DataFrame, state: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val st = stateFromRows(state.select(col("centroid_id").cast("long"),
      col("pos").cast("int"), col("csum").cast("long"), col("cnt").cast("long"))
      .collect(), 0, 1, 2, 3)
    vectors.select(col(idCol), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
      .withColumn("centroid_id", assignCidExpr(st, col("vec"), col("norm")))
      .select(col(idCol), col("centroid_id"))
  }

  /** Simplified silhouette over a [[trainCodebook]] STATE frame — the
    * clustering-quality metric that turns "did k-means converge to
    * something usable" (pick k, detect degenerate codebooks, decide a
    * retrain) into a gated number. Per vector, with cosine DISTANCE
    * d = 1 − sim: a = distance to the assigned (nearest) centroid,
    * b = distance to the second-nearest, s = (b − a) / b — the
    * centroid-based simplification of Rousseeuw 1987 (full silhouette
    * needs all pairwise distances; against centroids it is k dots per
    * row, the standard large-scale variant). s ∈ [0, 1e6] micros: 0 =
    * on the decision boundary, 1e6 = coincides with its centroid; a
    * cluster whose members average near 0 is not separated from its
    * neighbor.
    *
    * Everything follows the s04/s05 assignment key: round-6 cosine,
    * micro-integers, integral `div` (== DuckDB `//`), argmax ties to
    * the smallest centroid id — so per-cluster member counts and
    * silhouette sums/extremes hash-gate cross-engine. Scale shape:
    * codebook state is a bounded driver collect (k·dim rows), the
    * corpus pays ONE narrow codegen pass (k fused dots per row — zero
    * joins, no shuffle before the k-row rollup), output at cluster
    * cardinality. Requires k ≥ 2 — silhouette is undefined for a
    * single cluster.
    */
  def codebookSilhouette(vectors: DataFrame, state: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val st = stateFromRows(state.select(col("centroid_id").cast("long"),
      col("pos").cast("int"), col("csum").cast("long"), col("cnt").cast("long"))
      .collect(), 0, 1, 2, 3)
    require(st.size >= 2,
      s"silhouette needs >= 2 centroids, codebook has ${st.size}")
    val v = vectors.select(col(idCol), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val simMicros = st.map { case (_, sm, cnt) =>
      val cv = sm.map(s => s / (cnt * 1e6))
      val cn = math.sqrt(cv.map(x => x * x).sum)
      round(round6(graftDot(col("vec"), typedLit(cv)) / (col("norm") * lit(cn)))
        * 1e6, 0).cast("long")
    }
    val sorted = sort_array(array(simMicros: _*), asc = false)
    v.withColumn("centroid_id", assignCidExpr(st, col("vec"), col("norm")))
      .withColumn("_a", element_at(sorted, 1))
      .withColumn("_b", element_at(sorted, 2))
      // tie (a == b) → 0 by the arithmetic; both sims exactly 1 would
      // be 0/0 — defined as 0 (the vector sits on two centroids)
      .withColumn("sil_micro",
        when(col("_b") === lit(1000000L), lit(0L))
          .otherwise(expr("((_a - _b) * 1000000L) div (1000000L - _b)")))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("sil_micro")).as("sum_sil_micro"),
        min(col("sil_micro")).as("min_sil_micro"),
        max(col("sil_micro")).as("max_sil_micro"))
  }

  /** Deterministic spherical k-means (Lloyd's) codebook training — the
    * operator that turns [[ivfIndex]]/[[semanticDupPairs]]'s SAMPLED
    * codebooks into TRAINED ones. Seeds are the [[semanticDupPairs]]
    * md5-ordered first `k` corpus rows (reproducible, corpus-order
    * independent); each iteration assigns every vector to its
    * nearest centroid by ROUNDED cosine (round 6, ties to the smallest
    * centroid id — the s04 assignment key, so the whole training loop
    * replays in a SQL oracle) and recomputes centroids from the
    * assignment. Clusters that lose all members are dropped (the
    * standard Lloyd's variant with no re-seeding — deterministic).
    *
    * Centroid state is kept EXACT: per-dimension integer micro-sums
    * `Σ floor(x·1e6)` plus a count, never a floating mean. Summing
    * longs is order-independent (no FP reassociation across engines or
    * shuffle orders), and both engines derive the next iteration's
    * centroid component identically as `sum / (count · 1e6)` — one
    * IEEE division of exact integers. The returned frame IS that state,
    * flattened to `(centroid_id, pos, csum, cnt)` integer rows (the s05
    * gate surface); [[codebookVectors]] turns it back into
    * `(centroid_id, centroid)` for serving.
    *
    * Scale shape per iteration: assignment is a narrow codegen'd
    * literal-codebook expression (zero joins — right up to a few
    * hundred centroids; beyond that, the [[semanticDupPairs]]
    * `joinAssign` broadcast pattern applies); the update is ONE
    * exchange on (centroid_id, pos) whose map-side partial aggregation
    * collapses each partition to ≤ k·dim rows, then a k·dim-row driver
    * collect. Nothing driver-side ever scales with the corpus.
    */
  def trainCodebook(vectors: DataFrame, k: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = 4096): DataFrame = {
    // driver state is k·dim micro-sums and every iteration collects
    // ≤ k·dim aggregate rows — bounded by construction ONLY while k is
    // codebook-sized; a corpus-sized k must fail loudly up front
    require(k >= 1 && k <= maxCentroids,
      s"trainCodebook k=$k is outside [1, $maxCentroids] — the codebook is driver-side " +
      "state (k·dim rows per iteration); pass maxCentroids explicitly if a larger " +
      "codebook is intended")
    val spark = vectors.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val v = vectors.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val seed = v.orderBy(graft.functions.Cols.md5Uint32(col("id").cast("string")), col("id"))
      .limit(k).select(col("id"), col("vec")).collect()
    // state: (centroid_id, per-dim micro-sums, member count)
    var state: Seq[(Long, Array[Long], Long)] = seed.toSeq.map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray.map(x => math.floor(x * 1e6).toLong), 1L)
    }
    for (_ <- 1 to iters) {
      val assigned = v.withColumn("cid", assignCidExpr(state, col("vec"), col("norm")))
      val rows = assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(floor(col("x") * 1e6).cast("long")).as("sm"), count(lit(1)).as("cnt"))
        .collect()
      state = rows.groupBy(_.getLong(0)).toSeq.map { case (cid, rs) =>
        val byPos = rs.sortBy(_.getInt(1))
        (cid, byPos.map(_.getLong(2)).toArray, byPos.head.getLong(3))
      }.sortBy(_._1)
    }
    state.flatMap { case (cid, sm, cnt) =>
      // pos as long: the oracle derives it from range() (BIGINT), and
      // the gate checks schemas
      sm.iterator.zipWithIndex.map { case (s, pos) => (cid, pos.toLong, s, cnt) }
    }.toDF("centroid_id", "pos", "csum", "cnt")
  }

  /** Rounded-cosine argmax centroid id over a literal micro-sum state
    * (ties to the smallest centroid id — the s04/s05 assignment key).
    * Narrow, codegen'd, zero joins; shared by [[trainCodebook]] and the
    * PQ family so every consumer replays in SQL identically.
    */
  private def assignCidExpr(state: Seq[(Long, Array[Long], Long)],
      vec: Column, norm: Column): Column = {
    val sims = state.map { case (cid, sm, cnt) =>
      val cv = sm.map(s => s / (cnt * 1e6))
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(
        (-round6(graftDot(vec, typedLit(cv)) / (norm * lit(cn)))).as("negsim"),
        lit(cid).as("cid"))
    }
    array_min(array(sims: _*)).getField("cid")
  }

  /** Per-subspace columns `sub_s` (the s-th slice of the vector) and
    * `norm_s`, shared by the PQ train/encode paths.
    */
  private def withSubspaces(vectors: DataFrame, m: Int, d: Int,
      idCol: String, vecCol: String): DataFrame = {
    val base = vectors.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("vec"))
    (0 until m).foldLeft(base) { (df0, s) =>
      df0.withColumn(s"sub_$s", slice(col("vec"), s * d + 1, d))
        .withColumn(s"norm_$s", sqrt(graftDot(col(s"sub_$s"), col(s"sub_$s"))))
    }
  }

  private def stateFromRows(rows: Array[org.apache.spark.sql.Row],
      cidAt: Int, posAt: Int, smAt: Int, cntAt: Int): Seq[(Long, Array[Long], Long)] =
    rows.groupBy(_.getLong(cidAt)).toSeq.map { case (cid, rs) =>
      val byPos = rs.sortBy(_.getInt(posAt))
      (cid, byPos.map(_.getLong(smAt)).toArray, byPos.head.getLong(cntAt))
    }.sortBy(_._1)

  /** Product-quantization codebook training — [[trainCodebook]]'s
    * deterministic spherical Lloyd's run independently in each of `m`
    * subspaces of the vector (the PQ decomposition: a 64-dim corpus
    * stored as m codes of log2(k) bits each instead of 64 floats —
    * the 100 TB embedding-store compression lever, ~68× at the
    * defaults). Seeds are ONE md5-ordered corpus prefix shared by all
    * subspaces (one tiny collect); every training iteration is FUSED
    * across subspaces — one corpus pass computes all m assignments
    * (narrow literal-codebook argmax per subspace), explodes to
    * (sub, cid, pos, x) and re-aggregates the micro-sum state in ONE
    * exchange whose map-side partial agg collapses each partition to
    * ≤ m·k·d rows. Nothing driver-side scales with the corpus; the
    * wall-clock per iteration is one scan regardless of m.
    *
    * Centroid state is the s05 EXACT-integer representation (per-dim
    * `Σ floor(x·1e6)` + count) per (sub, centroid_id), returned
    * flattened as `(sub, centroid_id, pos, csum, cnt)` — integers
    * only, so the whole training replays in a SQL oracle.
    */
  def pqTrain(vectors: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = 4096): DataFrame = {
    // driver state is m·k·(dim/m) micro-sums per iteration — bounded
    // only while k stays codebook-sized (same contract as trainCodebook)
    require(k >= 1 && k <= maxCentroids,
      s"pqTrain k=$k is outside [1, $maxCentroids] — per-subspace codebooks are " +
      "driver-side state (m·k·d rows per iteration); pass maxCentroids explicitly " +
      "if larger codebooks are intended")
    val spark = vectors.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val d = dim / m
    val subs = withSubspaces(vectors, m, d, idCol, vecCol)
    val seed = subs.orderBy(graft.functions.Cols.md5Uint32(col("id").cast("string")), col("id"))
      .limit(k).select(col("id") +: (0 until m).map(s => col(s"sub_$s")): _*).collect()
    var states: Array[Seq[(Long, Array[Long], Long)]] = (0 until m).toArray.map { s =>
      seed.toSeq.map { r =>
        (r.getLong(0), r.getSeq[Double](s + 1).toArray.map(x => math.floor(x * 1e6).toLong), 1L)
      }
    }
    for (_ <- 1 to iters) {
      val perSub = (0 until m).map { s =>
        struct(lit(s).as("sub"),
          assignCidExpr(states(s), col(s"sub_$s"), col(s"norm_$s")).as("cid"),
          col(s"sub_$s").as("sv"))
      }
      val rows = subs.select(explode(array(perSub: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.cid").as("cid"),
          posexplode(col("e.sv")).as(Seq("pos", "x")))
        .groupBy("sub", "cid", "pos")
        .agg(sum(floor(col("x") * 1e6).cast("long")).as("sm"), count(lit(1)).as("cnt"))
        .collect()
      states = (0 until m).toArray.map { s =>
        stateFromRows(rows.filter(_.getInt(0) == s), 1, 2, 3, 4)
      }
    }
    states.zipWithIndex.flatMap { case (st, s) =>
      st.flatMap { case (cid, sm, cnt) =>
        sm.iterator.zipWithIndex.map { case (v2, pos) => (s, cid, pos.toLong, v2, cnt) }
      }
    }.toSeq.toDF("sub", "centroid_id", "pos", "csum", "cnt")
  }

  /** Encode every vector as its per-subspace nearest-centroid code
    * (rounded-cosine argmax, ties to the smallest centroid id — the
    * same key training used, so exact-duplicate vectors provably get
    * identical codes). One narrow pass: m literal-codebook argmaxes +
    * one explode, no joins, no shuffle beyond the caller's sink. Output
    * `(vec_id, sub, code)` — integers only (the s06 gate surface).
    */
  def pqEncode(vectors: DataFrame, state: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val stRows = state.select(col("sub").cast("int"), col("centroid_id").cast("long"),
      col("pos").cast("int"), col("csum").cast("long"), col("cnt").cast("long")).collect()
    val bySub = stRows.groupBy(_.getInt(0))
    val m = bySub.keys.max + 1
    val states = (0 until m).map(s => stateFromRows(bySub(s), 1, 2, 3, 4))
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subs = withSubspaces(vectors, m, dim / m, idCol, vecCol)
    val codes = (0 until m).map { s =>
      struct(lit(s).as("sub"),
        assignCidExpr(states(s), col(s"sub_$s"), col(s"norm_$s")).as("code"))
    }
    subs.select(col("id").as("vec_id"), explode(array(codes: _*)).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.code").as("code"))
  }

  /** ADC (asymmetric-distance) top-k over a PQ-encoded corpus: the
    * probe stays exact, each corpus vector is its reconstruction from
    * the per-subspace codebooks, and similarity is cosine(probe,
    * reconstruction) assembled WITHOUT ever materializing the
    * reconstruction — per (probe, sub, code) partial dot products and
    * centroid norms² are a |probes|·m·k lookup table built once and
    * broadcast, so the corpus side touches only its integer codes.
    * Shuffle profile: codes (m rows per corpus vector, no payload)
    * broadcast-join the LUT, then ONE exchange on (query_id, vec_id)
    * whose map-side partial agg collapses the m rows per pair; top-k
    * per probe via [[rankTopK]]'s custom prune node. The corpus'
    * floats are never read — at 100 TB the scan input shrinks by the
    * PQ compression ratio (~68× at m=4, k=8, 64-dim f32).
    */
  def pqTopK(probes: DataFrame, codes: DataFrame, state: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxProbes: Long = 65536L): DataFrame = {
    val spark = probes.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // the probe set is collected (the LUT is |probes|·m·k by design);
    // a corpus-sized frame here must fail loudly, not OOM the driver
    requireBounded(probes, maxProbes, "pqTopK probe set", "maxProbes")
    val stRows = state.select(col("sub").cast("int"), col("centroid_id").cast("long"),
      col("pos").cast("int"), col("csum").cast("long"), col("cnt").cast("long")).collect()
    val bySub = stRows.groupBy(_.getInt(0))
    val m = bySub.keys.max + 1
    val centroids: Map[(Int, Long), Array[Double]] = bySub.flatMap { case (s, rs) =>
      stateFromRows(rs, 1, 2, 3, 4).map { case (cid, sm, cnt) =>
        ((s, cid), sm.map(x => x / (cnt * 1e6)))
      }
    }.toMap
    val pr = probes.select(col(idCol).cast("long").as("query_id"),
        asDouble(col(vecCol)).as("qv")).collect()
    // LUT rows: (query_id, sub, code, partial dot, centroid norm², probe norm)
    val lut = pr.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val d = qv.length / m
      centroids.map { case ((s, cid), cv) =>
        val qs = qv.slice(s * d, s * d + d)
        val pdot = qs.zip(cv).map { case (a, b) => a * b }.sum
        (qid, s, cid, pdot, cv.map(x => x * x).sum, qn)
      }
    }.toSeq.toDF("query_id", "sub", "code", "pdot", "cnorm2", "qn")
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("pdot").as("num"), sum("cnorm2").as("den2"), first("qn").as("qn"))
      .withColumn("sim", round6(col("num") / (col("qn") * sqrt(col("den2")))))
      .filter(col("query_id") =!= col("neighbor_id"))
    rankTopK(scored, k)
  }

  /** The coarse quantizer of the IVF-PQ composite index: the
    * md5-seeded sampled codebook in [[ivfIndex]]'s `(id, vec, norm)`
    * serving shape. md5 ordering (not [[ivfIndex]]'s xxhash64) because
    * the composite's assignment sits under a SQL hash gate (s21) and
    * md5 is the replayable convention ([[semanticDupPairs]]'s s04
    * precedent).
    */
  def ivfPqCoarse(corpus: DataFrame, nLists: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
      .orderBy(graft.functions.Cols.md5Uint32(col("id").cast("string")), col("id"))
      .limit(nLists)
  }

  /** IVF-PQ composite INDEX build — the FAISS IndexIVFPQ layout over
    * the house conventions: coarse quantizer = [[ivfPqCoarse]]'s
    * md5-seeded codebook (rounded-cosine argmax assignment, ties to
    * the smallest centroid id), fine quantizer = [[pqTrain]]'s
    * per-subspace codebooks over the same corpus. PQ encodes the
    * ORIGINAL vector, not the residual (FAISS `by_residual=false`):
    * residual PQ needs L2 geometry plus a zero-residual escape hatch
    * (a vector that IS a centroid has no cosine direction), so the
    * no-residual mode is what keeps the whole build replayable — a
    * documented boundary, not an accident. Output: one row per
    * (vector, subspace): `(vec_id, list_id, sub, code)` — integers
    * only, the s06 gate surface with the coarse assignment riding
    * along. Persist partitioned by list_id; [[ivfPqTopK]] then reads
    * only nProbe/nLists of the code rows on top of PQ's ~68× byte
    * shrink — the real IndexIVFPQ cost model.
    */
  def ivfPqCodes(corpus: DataFrame, nLists: Int = 16, m: Int = 4,
      k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    ivfPqEncodeWith(corpus,
      ivfPqCoarse(corpus, nLists, idCol, vecCol).collect(),
      pqTrain(corpus, m, k, iters, idCol, vecCol), idCol, vecCol)
  }

  /** The [[ivfPqCodes]] encode against EXISTING quantizers (coarse
    * codebook rows + PQ state) — the batch-side computation factored
    * out so incremental maintenance ([[updateIvfPqIndex]]) reuses the
    * live quantizers instead of retraining.
    */
  private def ivfPqEncodeWith(vectors: DataFrame,
      cbRows: Array[org.apache.spark.sql.Row], state: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val c = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("norm", sqrt(graftDot(col("vec"), col("vec"))))
    val assigned = c.withColumn("list_id",
        element_at(nearestCentroidsExpr(cbRows, "vec", "norm", 1, rounded = true), 1)
          .getField("centroid_id"))
      .select(col("id").as("vec_id"), col("list_id"))
    pqEncode(vectors, state, idCol, vecCol)
      .join(assigned, "vec_id")
      .select(col("vec_id"), col("list_id"), col("sub"), col("code"))
  }

  /** ADC serving over an [[ivfPqCodes]] index: probe the `nProbe`
    * nearest coarse lists per query (the build's rounded-argmax
    * ordering), then [[pqTopK]]'s broadcast-LUT scoring restricted to
    * the probed lists' codes — the corpus side touches only integer
    * codes of nProbe/nLists of the lists. At nProbe = nLists this
    * EQUALS [[pqTopK]] row for row (pinned in ExtSpec); below it the
    * usual IVF recall trade applies. Probe set and coarse codebook are
    * bounded driver state (the [[pqTopK]] LUT contract).
    */
  def ivfPqTopK(probes: DataFrame, codes: DataFrame, state: DataFrame,
      coarse: DataFrame, k: Int = 10, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxProbes: Long = 65536L): DataFrame = {
    val spark = probes.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    requireBounded(probes, maxProbes, "ivfPqTopK probe set", "maxProbes")
    val cbRows = coarse.select(col("id").cast("long"), col("vec"), col("norm")).collect()
    require(nProbe >= 1 && nProbe <= cbRows.length,
      s"nProbe $nProbe must be in [1, ${cbRows.length}]")
    val stRows = state.select(col("sub").cast("int"), col("centroid_id").cast("long"),
      col("pos").cast("int"), col("csum").cast("long"), col("cnt").cast("long")).collect()
    val bySub = stRows.groupBy(_.getInt(0))
    val m = bySub.keys.max + 1
    val centroids: Map[(Int, Long), Array[Double]] = bySub.flatMap { case (s, rs) =>
      stateFromRows(rs, 1, 2, 3, 4).map { case (cid, sm, cnt) =>
        ((s, cid), sm.map(x => x / (cnt * 1e6)))
      }
    }.toMap
    val pr = probes.select(col(idCol).cast("long").as("query_id"),
        asDouble(col(vecCol)).as("qv")).collect()
    // per-query probed lists, driver-side over the already-bounded
    // probe set: the same (−rounded sim, id) order the build assigned by
    val probeLists = pr.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val qn = math.sqrt(qv.map(x => x * x).sum)
      cbRows.map { cr =>
        val cv = cr.getSeq[Double](1).toArray
        val sim = math.floor(
          qv.zip(cv).map { case (a, b) => a * b }.sum / (qn * cr.getDouble(2))
            * 1e6 + 0.5) / 1e6
        (qid, cr.getLong(0), sim)
      }.sortBy { case (_, cid, s) => (-s, cid) }
        .take(nProbe).map { case (q, c, _) => (q, c) }
    }.toSeq.toDF("query_id", "list_id")
    val lut = pr.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val d = qv.length / m
      centroids.map { case ((s, cid), cv) =>
        val qs = qv.slice(s * d, s * d + d)
        val pdot = qs.zip(cv).map { case (a, b) => a * b }.sum
        (qid, s, cid, pdot, cv.map(x => x * x).sum, qn)
      }
    }.toSeq.toDF("query_id", "sub", "code", "pdot", "cnorm2", "qn")
    val cand = codes.join(broadcast(probeLists), Seq("list_id"))
      .select(col("query_id"), col("vec_id"), col("sub"), col("code"))
    val scored = cand.join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("pdot").as("num"), sum("cnorm2").as("den2"), first("qn").as("qn"))
      .withColumn("sim", round6(col("num") / (col("qn") * sqrt(col("den2")))))
      .filter(col("query_id") =!= col("neighbor_id"))
    rankTopK(scored, k)
  }

  /** A [[trainCodebook]] state frame as `(centroid_id, centroid)`
    * double vectors — the serving-side codebook shape
    * ([[ivfIndex]]-style argmax assignment takes it from here).
    */
  def codebookVectors(state: DataFrame): DataFrame =
    state.groupBy("centroid_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("csum"), col("cnt")))),
        s => s.getField("csum") / (s.getField("cnt") * lit(1e6))).as("centroid"))

  /** Per-dimension corpus stats for [[sqEncode]] as EXACT integer
    * micro-units: `(pos, mn, mx)` over `floor(x·1e6)` — tiny (dim
    * rows), broadcast into the encode join.
    */
  def sqStats(vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors
      .select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col("pos").cast("long").as("pos"),
        floor(col("x") * 1e6).cast("long").as("xi"))
      .groupBy("pos").agg(min("xi").as("mn"), max("xi").as("mx"))

  /** Scalar (int8) quantization: each dimension linearly mapped to
    * 0..255 against the corpus per-dim min/max — the simple 4× scan
    * shrink next to [[pqTrain]]'s ~68× (int8 keeps per-dim resolution;
    * PQ trades it for codebook structure). All arithmetic is positive-
    * long multiply/divide over the EXACT micro-unit stats
    * (`code = ((xi − mn)·255) div (mx − mn)`, constant dims → 0), so
    * the whole encode — stats included — replays in SQL and the s07
    * gate compares integers only. Plan: one narrow posexplode, ONE
    * dim-rows aggregate broadcast back, no data-sized shuffle before
    * the caller's sink. Reconstruction error is bounded by one
    * quantization step per dim ([[sqDecode]]; bound pinned in
    * ExtSpec).
    */
  /** Element-wise mean pooling — per group, the centroid of its
    * vectors in exact integer micros: the building block every
    * embedding reducer uses (chunk→document pooling, cluster
    * centroids, class prototypes), exposed and gated in its own right.
    * Components go through the s07 `floor(x·10⁶)` micro convention;
    * the mean is the FLOOR mean, computed as
    * `(Σxi + n·F) div n − F` with a large positive offset F so the
    * dividend is always positive — Spark's `div` truncates toward zero
    * while SQL `//` floors, and they only agree on non-negative
    * operands (components are signed, so the naive `Σxi div n` would
    * hash-split the engines on any negative-sum dimension).
    *
    * Plan: one posexplode + one map-side-combined (group, pos)
    * aggregation — dim·|groups| rows out, no join, nothing
    * corpus-sized on the driver.
    */
  def meanPool(vectors: DataFrame, groupCol: org.apache.spark.sql.Column,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors
      .select(groupCol.as("group_id"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col("group_id"), col("pos").cast("long").as("pos"),
        floor(col("x") * 1e6).cast("long").as("xi"))
      .groupBy("group_id", "pos")
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"))
      .select(col("group_id"), col("pos"), col("n"),
        expr("(sx + n * 1000000000) div n - 1000000000").as("centroid_micro"))

  def sqEncode(vectors: DataFrame, stats: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val st = stats.getOrElse(sqStats(vectors, idCol, vecCol))
    vectors
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        floor(col("x") * 1e6).cast("long").as("xi"))
      .join(broadcast(st), "pos")
      .select(col("vec_id"), col("pos"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(expr("((xi - mn) * 255) div (mx - mn)")).as("code"))
  }

  /** Midpoint dequantization of [[sqEncode]] codes back to doubles:
    * code c covers the micro-unit cell `[mn + c·w, mn + (c+1)·w)` with
    * `w = (mx − mn)/255`, so the midpoint `(mn + (c + 0.5)·w) / 1e6`
    * sits within half a cell (+1 micro-unit for the stats' floor) of
    * the original component (bound pinned in ExtSpec; serving-side
    * approximate search runs on these).
    */
  def sqDecode(codes: DataFrame, stats: DataFrame): DataFrame =
    codes.join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos"),
        ((col("mn") + (col("code") + lit(0.5)) * (col("mx") - col("mn")) / lit(255.0))
          / lit(1e6)).as("x"))

  case class PqParams(m: Int, k: Int, iters: Int, dim: Int)

  private def pqParamsPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_graft_pq_params.json")

  private[ext] def writePqParams(spark: org.apache.spark.sql.SparkSession,
      path: String, p: PqParams): Unit = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val out = fs.create(pqParamsPath(path), true)
    try out.write(
      s"""{"m":${p.m},"k":${p.k},"iters":${p.iters},"dim":${p.dim}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The [[PqParams]] sidecar of a persisted PQ index; None if absent. */
  def readPqIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[PqParams] = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    if (!fs.exists(pqParamsPath(path))) return None
    val in = fs.open(pqParamsPath(path))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(key: String) = s""""$key":(-?[0-9]+)""".r.findFirstMatchIn(txt).map(_.group(1))
    for {
      m <- field("m"); k <- field("k"); i <- field("iters"); d <- field("dim")
    } yield PqParams(m.toInt, k.toInt, i.toInt, d.toInt)
  }

  /** Persist a PQ index: train ([[pqTrain]]), encode ([[pqEncode]]),
    * write the integer codebook state to `<path>/codebook` and the
    * codes — repartitioned on the ADC probe join's (sub, code) key for
    * co-located bucket reads — to `<path>/codes`, plus a
    * `_graft_pq_params.json` sidecar so serving can never probe with
    * mismatched decomposition parameters (the LSH-seed footgun, PQ
    * edition: codes are dense small ints, so a wrong (m, k) would
    * JOIN fine and return garbage).
    */
  def writePqIndex(vectors: DataFrame, path: String, m: Int = 4, k: Int = 8,
      iters: Int = 2, idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = vectors.sparkSession
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    val state = pqTrain(vectors, m, k, iters, idCol, vecCol)
    state.write.mode("overwrite").parquet(s"$path/codebook")
    pqEncode(vectors, state, idCol, vecCol)
      .repartition(col("sub"), col("code"))
      .write.mode("overwrite").parquet(s"$path/codes")
    writePqParams(spark, path, PqParams(m, k, iters, dim))
  }

  /** Read a persisted PQ index back as (codes, codebook state). */
  def readPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/codes"), spark.read.parquet(s"$path/codebook"))

  /** Incremental maintenance of a persisted PQ index: encode the
    * ingest batch with the LIVE per-subspace codebooks, drop stale code
    * rows of re-ingested ids, and promote (same codebook state,
    * kept ∪ fresh codes) through the fuse-guarded
    * [[IndexLifecycle.swapIn]]. Like [[updateIvfIndex]], the trained
    * structure does not move on upsert — quantization error for the
    * batch is whatever the existing codebooks give it, and retraining
    * is a rebuild decision ([[IndexLifecycle.rebuildPqIndex]]) taken on
    * distribution drift. Batch dimensionality is validated against the
    * sidecar. `update == (live state, re-encode(grown))` is pinned in
    * IndexLifecycleSpec.
    */
  def updatePqIndex(spark: org.apache.spark.sql.SparkSession,
      newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val p = readPqIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_pq_params.json sidecar — not an index this can update"))
    val batchDim = newVectors.select(size(col(vecCol))).head().getInt(0)
    require(batchDim == p.dim,
      s"batch dim $batchDim != index dim ${p.dim} — encoding would be garbage")
    val (codes, state) = readPqIndex(spark, path)
    val kept = codes.join(newVectors.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_anti")
    val fresh = pqEncode(newVectors, state, idCol, vecCol)
    val rebuild = s"${path}_rebuild"
    state.write.mode("overwrite").parquet(s"$rebuild/codebook")
    kept.unionByName(fresh)
      .repartition(col("sub"), col("code"))
      .write.mode("overwrite").parquet(s"$rebuild/codes")
    writePqParams(spark, rebuild, p)
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Deletion propagation for a persisted PQ index: drop every code
    * row of the forgotten ids (codes are a lossy encoding of the
    * deleted vectors — still the id's content, still purged) and swap;
    * codebook state and sidecar carry over. `forget == (live state,
    * codes minus ids)` is pinned in IndexLifecycleSpec.
    */
  def forgetPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, forgetIds: DataFrame, idCol: String = "vec_id"): Unit = {
    val p = readPqIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_pq_params.json sidecar — not an index this can update"))
    val (codes, state) = readPqIndex(spark, path)
    val rebuild = s"${path}_rebuild"
    state.write.mode("overwrite").parquet(s"$rebuild/codebook")
    codes.join(forgetIds.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_anti")
      .repartition(col("sub"), col("code"))
      .write.mode("overwrite").parquet(s"$rebuild/codes")
    writePqParams(spark, rebuild, p)
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** [[pqTopK]] against a persisted index, with the decomposition
    * parameters validated from the index's own sidecar — the
    * footgun-free serving call. Requires the sidecar.
    */
  def pqTopKAt(spark: org.apache.spark.sql.SparkSession, probes: DataFrame,
      k: Int, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = readPqIndexParams(spark, path).getOrElse(throw new IllegalStateException(
      s"$path has no _graft_pq_params.json sidecar; serve with pqTopK explicitly"))
    val probeDim = probes.select(size(col(vecCol))).head().getInt(0)
    require(probeDim == p.dim,
      s"probe dim $probeDim != index dim ${p.dim} (index at $path)")
    val (codes, state) = readPqIndex(spark, path)
    pqTopK(probes, codes, state, k, idCol, vecCol)
  }

  case class IvfPqParams(nLists: Int, m: Int, k: Int, iters: Int, dim: Int)

  private def ivfPqParamsPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_graft_ivfpq_params.json")

  private[ext] def writeIvfPqParams(spark: org.apache.spark.sql.SparkSession,
      path: String, p: IvfPqParams): Unit = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    val out = fs.create(ivfPqParamsPath(path), true)
    try out.write(
      s"""{"nLists":${p.nLists},"m":${p.m},"k":${p.k},"iters":${p.iters},"dim":${p.dim}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The [[IvfPqParams]] sidecar of a persisted IVF-PQ index; None if
    * absent.
    */
  def readIvfPqIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[IvfPqParams] = {
    val fs = graft.fs.Fs.getFileSystem(spark.sparkContext.hadoopConfiguration, path)
    if (!fs.exists(ivfPqParamsPath(path))) return None
    val in = fs.open(ivfPqParamsPath(path))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(key: String) = s""""$key":(-?[0-9]+)""".r.findFirstMatchIn(txt).map(_.group(1))
    for {
      n <- field("nLists"); m <- field("m"); k <- field("k")
      i <- field("iters"); d <- field("dim")
    } yield IvfPqParams(n.toInt, m.toInt, k.toInt, i.toInt, d.toInt)
  }

  /** Persist an IVF-PQ composite index — the TENTH index-lifecycle
    * family: `<path>/coarse` (the (id, vec, norm) coarse quantizer),
    * `<path>/codebook` (the integer PQ state), `<path>/codes` (the
    * [[ivfPqCodes]] table REPARTITIONED ON list_id — the probe prune
    * key, so a serve reads only its nProbe/nLists fraction of the code
    * files), plus a `_graft_ivfpq_params.json` sidecar that pins the
    * full parameter tuple (a wrong (nLists, m, k) would join fine and
    * return garbage — the PQ-sidecar footgun with one more knob).
    */
  def writeIvfPqIndex(vectors: DataFrame, path: String, nLists: Int = 16,
      m: Int = 4, k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = vectors.sparkSession
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    val coarse = ivfPqCoarse(vectors, nLists, idCol, vecCol)
    val state = pqTrain(vectors, m, k, iters, idCol, vecCol)
    coarse.write.mode("overwrite").parquet(s"$path/coarse")
    state.write.mode("overwrite").parquet(s"$path/codebook")
    ivfPqEncodeWith(vectors, coarse.collect(), state, idCol, vecCol)
      .repartition(col("list_id"))
      .write.mode("overwrite").parquet(s"$path/codes")
    writeIvfPqParams(spark, path, IvfPqParams(nLists, m, k, iters, dim))
  }

  /** Read a persisted [[writeIvfPqIndex]] back as
    * (codes, PQ state, coarse codebook).
    */
  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/codebook"),
      spark.read.parquet(s"$path/coarse"))

  /** [[ivfPqTopK]] against a persisted index, parameters validated
    * from the sidecar — the footgun-free composite serving call.
    */
  def ivfPqTopKAt(spark: org.apache.spark.sql.SparkSession, probes: DataFrame,
      k: Int, path: String, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = readIvfPqIndexParams(spark, path).getOrElse(throw new IllegalStateException(
      s"$path has no _graft_ivfpq_params.json sidecar; serve with ivfPqTopK explicitly"))
    val probeDim = probes.select(size(col(vecCol))).head().getInt(0)
    require(probeDim == p.dim,
      s"probe dim $probeDim != index dim ${p.dim} (index at $path)")
    require(nProbe >= 1 && nProbe <= p.nLists,
      s"nProbe $nProbe must be in [1, ${p.nLists}] (index at $path)")
    val (codes, state, coarse) = readIvfPqIndex(spark, path)
    ivfPqTopK(probes, codes, state, coarse, k, nProbe, idCol, vecCol)
  }

  /** Incremental maintenance of a persisted IVF-PQ index: assign +
    * encode the ingest batch against the LIVE quantizers (coarse
    * codebook AND PQ state both stable on upsert — membership changes
    * live in the code rows, retraining is a rebuild decision on
    * distribution drift, the FAISS convention both parents follow),
    * drop stale rows of re-ingested ids, and promote through the
    * fuse-guarded [[IndexLifecycle.swapIn]]. Batch dimensionality is
    * validated against the sidecar. `update == re-encode(grown) under
    * the live quantizers` is pinned in IndexLifecycleSpec.
    */
  def updateIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      newVectors: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val p = readIvfPqIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_ivfpq_params.json sidecar — not an index this can update"))
    val batchDim = newVectors.select(size(col(vecCol))).head().getInt(0)
    require(batchDim == p.dim,
      s"batch dim $batchDim != index dim ${p.dim} — encoding would be garbage")
    val (codes, state, coarse) = readIvfPqIndex(spark, path)
    val kept = codes.join(newVectors.select(col(idCol).as("vec_id")),
      Seq("vec_id"), "left_anti")
    val fresh = ivfPqEncodeWith(newVectors, coarse.collect(), state, idCol, vecCol)
    val rebuild = s"${path}_rebuild"
    coarse.write.mode("overwrite").parquet(s"$rebuild/coarse")
    state.write.mode("overwrite").parquet(s"$rebuild/codebook")
    kept.unionByName(fresh)
      .repartition(col("list_id"))
      .write.mode("overwrite").parquet(s"$rebuild/codes")
    writeIvfPqParams(spark, rebuild, p)
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** Deletion propagation for a persisted IVF-PQ index: purge every
    * code row of the forgotten ids and swap; both quantizers and the
    * sidecar carry over (`forget == codes minus ids`, pinned in
    * IndexLifecycleSpec).
    */
  def forgetIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, forgetIds: DataFrame, idCol: String = "vec_id"): Unit = {
    val p = readIvfPqIndexParams(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no _graft_ivfpq_params.json sidecar — not an index this can update"))
    val (codes, state, coarse) = readIvfPqIndex(spark, path)
    val rebuild = s"${path}_rebuild"
    coarse.write.mode("overwrite").parquet(s"$rebuild/coarse")
    state.write.mode("overwrite").parquet(s"$rebuild/codebook")
    codes.join(forgetIds.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_anti")
      .repartition(col("list_id"))
      .write.mode("overwrite").parquet(s"$rebuild/codes")
    writeIvfPqParams(spark, rebuild, p)
    IndexLifecycle.swapIn(spark, rebuild, path)
  }

  /** [[cosineDupPairs]] at corpus scale: random-hyperplane LSH buckets
    * shrink the quadratic stage from n² to Σ(bucket²) — only vectors
    * sharing a bucket in at least one of `tables` hash tables are
    * compared, then exact cosine inside the candidate set keeps
    * precision 1.0 (no false pairs). Recall is the LSH trade-off and is
    * a function of the angle at `minSim`: near-dup thresholds (≥ ~0.9)
    * give ~1.0 recall at the defaults; loose thresholds need more
    * tables/fewer bits. Shuffle profile: each side materializes
    * n·tables (id, vec, bucket) rows for ONE equi-join on
    * (table, bucket) — no all-pairs exchange ever forms, and a hot
    * bucket is bounded by 2^bitsPerTable fan-in, not n.
    */
  def cosineDupPairsLsh(vectors: DataFrame, minSim: Double, dim: Int,
      bitsPerTable: Int = 8, tables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val bucketed = lshBucketed(vectors, dim, bitsPerTable, tables, 2000L,
      idCol, vecCol, "id", "v", "nrm")
    val a = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    // threshold BEFORE the pair-dedupe so the distinct shuffle carries
    // only true dups (a candidate pair re-found by every table would
    // otherwise ride the exchange `tables` times)
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b") && pairSim >= minSim)
      .select(col("id_a"), col("id_b"), round6(pairSim).as("sim"))
      .dropDuplicates("id_a", "id_b")
  }

  /** [[cosineDupPairsNew]] at corpus scale: the incoming batch is
    * hashed with the index's hyperplanes and joined against a PERSISTED
    * corpus [[lshIndex]] on (table, bucket) — per batch the corpus
    * contributes only same-bucket rows (bounded by 2^bitsPerTable
    * fan-in), vs the brute path's full corpus stream under a broadcast
    * nested-loop. Same output contract as [[cosineDupPairsNew]]:
    * batch-touching pairs only, (new, corpus) orientation plus ordered
    * new×new (found via the batch's own buckets), each unordered pair
    * once, threshold on exact cosine so precision is 1.0 — recall is
    * the LSH trade-off, ~1.0 at near-dup thresholds (pinned against the
    * brute twin in ExtSpec on a planted-twin corpus). Batch ids
    * reappearing in the index are superseded by an anti-join on id
    * BEFORE pairing, exactly like the minhash incremental path.
    */
  def cosineDupPairsNewLsh(newVecs: DataFrame, corpusIndex: DataFrame, minSim: Double,
      dim: Int, bitsPerTable: Int = 8, tables: Int = 8, seedBase: Long = 2000L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(newVecs.sparkSession)
    val batch = lshBucketed(newVecs, dim, bitsPerTable, tables, seedBase,
      idCol, vecCol, "id", "vec", "norm")
    val a = batch.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("vec").as("va"), col("norm").as("na"))
    val idxOnly = corpusIndex
      .join(newVecs.select(col(idCol).as("id")), Seq("id"), "left_anti")
    val b = idxOnly.select(col("table"), col("bucket"), col("id").as("id_b"),
        col("vec").as("vb"), col("norm").as("nb"))
      .withColumn("isNew", lit(false))
      .unionByName(batch.select(col("table"), col("bucket"), col("id").as("id_b"),
          col("vec").as("vb"), col("norm").as("nb"))
        .withColumn("isNew", lit(true)))
    a.join(b, Seq("table", "bucket"))
      .filter((!col("isNew") || col("id_a") < col("id_b")) && pairSim >= minSim)
      .select(col("id_a"), col("id_b"), round6(pairSim).as("sim"))
      .dropDuplicates("id_a", "id_b")
  }

  /** (id, vec, norm) side projection for the brute-force pair joins —
    * id as `idAs`, doubles as `vAs`, L2 norm as `nAs`.
    */
  private def normedSide(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vAs: String, nAs: String): DataFrame =
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vAs))
      .withColumn(nAs, sqrt(graftDot(col(vAs), col(vAs))))

  /** Raw cosine between two [[normedSide]]s — THE oracle-matched formula
    * (dot / (na*nb), threshold on the RAW value, round(6) only on
    * output). Every pair operator must use this single definition: the
    * DuckDB `list_cosine_similarity` oracles hash-match it exactly, and
    * a drifted copy would silently fail the gate for whichever twin
    * missed the change.
    */
  private def pairSim: Column =
    graftDot(col("va"), col("vb")) / (col("na") * col("nb"))

  /** All pairs with cosine ≥ minSim (embedding near-dup detection),
    * brute force; a < b.
    */
  def cosineDupPairs(vectors: DataFrame, minSim: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val a = normedSide(vectors, idCol, vecCol, "id_a", "va", "na")
    val b = normedSide(vectors, idCol, vecCol, "id_b", "vb", "nb")
    // both predicates in the join condition, cheap id check FIRST: a
    // pushed-down filter would land before it and run the dot product on
    // all n² ordered pairs instead of n²/2
    a.join(b, col("id_a") < col("id_b") && pairSim >= minSim)
      .select(col("id_a"), col("id_b"), round6(pairSim).as("sim"))
  }

  /** Incremental embedding near-dedup: pairs between a NEW batch and an
    * existing corpus, plus new-vs-new — never corpus-vs-corpus. The
    * production ingest shape ([[graft.ext.Dedup.minhashDedupNewPairs]]'s
    * embedding twin): each batch costs O(|new| · |corpus|) comparisons,
    * not the O(|corpus|²) a full re-dedup pays, and the small new side
    * is broadcast so the corpus never shuffles at all. Batch rows are
    * authoritative for shared ids (the stale corpus copy is anti-joined
    * out before pairing). Output is (id_a=new, id_b=other, sim), each
    * unordered pair once (new-new pairs ordered id_a < id_b).
    *
    * The new batch is broadcast whole (`broadcastBatch = true`), so it
    * must fit in driver + executor memory — the intended shape is an
    * ingest micro-batch of up to a few hundred MB against an unbounded
    * corpus. For a batch too big to broadcast pass
    * `broadcastBatch = false`: the join degrades to a partitioned
    * cartesian pairing (correct, more exchange) instead of failing on
    * the broadcast size limit.
    */
  def cosineDupPairsNew(newVecs: DataFrame, corpus: DataFrame, minSim: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastBatch: Boolean = true): DataFrame = {
    GraftFunctions.ensureRegistered(newVecs.sparkSession)
    val corpusOnly = corpus.join(newVecs.select(col(idCol)), Seq(idCol), "left_anti")
    val a = normedSide(newVecs, idCol, vecCol, "id_a", "va", "na")
    val b = normedSide(corpusOnly, idCol, vecCol, "id_b", "vb", "nb")
      .withColumn("isNew", lit(false))
      .unionByName(normedSide(newVecs, idCol, vecCol, "id_b", "vb", "nb")
        .withColumn("isNew", lit(true)))
    // broadcast the batch: the theta-join then streams the corpus side
    // partition-local (BroadcastNestedLoopJoin) instead of degenerating
    // to a CartesianProduct exchange of the whole corpus
    (if (broadcastBatch) broadcast(a) else a).join(b,
        (!col("isNew") || col("id_a") < col("id_b")) && pairSim >= minSim)
      .select(col("id_a"), col("id_b"), round6(pairSim).as("sim"))
  }
}
