package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * The workhorse is [[perKeyExact]]: EXACTLY min(k, |group|) rows per
  * key, deterministic across runs and cluster layouts — the property
  * `df.sample`/`rand()` cannot give (their output changes with
  * partitioning, which makes pipeline reruns non-reproducible).
  * Selection order is a seeded hash of the row's id columns, so it is
  * unbiased w.r.t. any data ordering, and the heavy lifting is the
  * custom [[graft.plans.TopKPerKeyNode]] operator — one shuffle, no
  * rank column, no per-group buffering beyond the stream.
  */
object Sampling {

  /** @param keys    stratum columns (e.g. language, source)
    * @param idCols  columns whose hash drives selection — must identify
    *        a row stably (e.g. doc_id); reruns then pick the SAME sample
    * @param k       rows to keep per stratum
    * @param seed    vary to draw a different (still deterministic) sample
    */
  def perKeyExact(df: DataFrame, keys: Seq[String], idCols: Seq[String], k: Int,
      seed: Long = 42L): DataFrame = {
    require(idCols.nonEmpty, "need id columns to hash for deterministic selection")
    require(!df.columns.contains("_sample_order"),
      "column name _sample_order is reserved by Sampling.perKeyExact")
    val tagged = df.withColumn("_sample_order",
      xxhash64(lit(seed) +: idCols.map(col): _*))
    TopK.perKey(tagged, keys, Seq(("_sample_order", false)), k)
      .drop("_sample_order")
  }

  /** [[perKeyExact]] with the 60-bit md5 priority instead of xxhash64
    * — the oracle-replayable TWIN (the d07/d04 convention: md5 replays
    * as one `substr(md5(...))` expression in SQL, where multi-column
    * long-typed xxhash64 would need the hashLong chain). Same
    * selection machinery: seeded hash rank with id tie-break,
    * truncated by the custom [[graft.plans.TopKPerKeyNode]] operator —
    * one exchange on the key, streamed k-row heaps, ≤ |keys|·k rows
    * out regardless of corpus size. Gated end-to-end by t40.
    */
  def perKeyExactMd5(df: DataFrame, keyCol: String, idCol: String, k: Int,
      seed: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("_sample_order"),
      "column name _sample_order is reserved by Sampling.perKeyExactMd5")
    val pri = conv(substring(md5(
        concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    TopK.perKey(df.withColumn("_sample_order", pri),
      keys = Seq(keyCol), order = Seq(("_sample_order", false), (idCol, false)),
      k = k)
      .drop("_sample_order")
  }

  /** Weight-proportional sampling without replacement — priority
    * sampling (Duffield/Lund/Thorup, JACM 2007): each row gets priority
    * w / u for a per-row uniform u in (0,1], and the m highest
    * priorities form the sample. Heavier rows draw larger priorities,
    * so inclusion probability scales with weight, and the top-m is a
    * single TakeOrdered pass — no per-row acceptance loop, no resample
    * on rejection, one reduction.
    *
    * u derives from md5 of the id columns, NOT rand(): reruns and
    * cluster re-layouts pick the same sample, and every arithmetic step
    * is IEEE +,/ on doubles (no pow/ln), so an external engine hashing
    * the same ids reproduces the sample bit-for-bit (q22 gate).
    *
    * @param weightCol positive numeric weights; rows with w <= 0 are
    *        never sampled
    */
  def weightedPriority(df: DataFrame, weightCol: String, idCols: Seq[String], m: Int,
      seed: String = "graft"): DataFrame = {
    require(idCols.nonEmpty, "need id columns to hash for deterministic selection")
    require(!df.columns.contains("priority"),
      "column name priority is reserved by Sampling.weightedPriority")
    val idConcat = concat_ws(":", lit(seed) +: idCols.map(c => col(c).cast("string")): _*)
    // md5-derived 32-bit uniform -> u in (0, 1]
    val h = graft.functions.Cols.md5Uint32(idConcat)
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc +: idCols.map(col): _*)
      .limit(m)
  }

  /** Deterministic train/val/test split assignment: each row's label is
    * a pure function of its id hash, so the split survives reruns,
    * re-partitioning, corpus growth (existing rows never change label
    * when new rows arrive), and re-implementation in another engine —
    * the property that makes a training split auditable. Thresholds are
    * INTEGER cutoffs of the 32-bit md5 space (`⌊cum·2³²⌋`), so the
    * assignment involves no float comparison anywhere and is exactly
    * reproducible in SQL (t09 gate). Narrow (one hash + one when-chain
    * per row, no shuffle). Weights must sum to 1 (±1e-9); rounding of
    * the cutoffs biases each band by < 2⁻³² — immaterial against the
    * statistical fluctuation of any finite corpus.
    */
  def hashSplit(df: DataFrame, idCols: Seq[String], splits: Seq[(String, Double)],
      seed: String = "graft", splitCol: String = "split"): DataFrame = {
    require(idCols.nonEmpty, "need id columns to hash for deterministic assignment")
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "split weights must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val idConcat = concat_ws(":", lit(seed) +: idCols.map(c => col(c).cast("string")): _*)
    val h = graft.functions.Cols.md5Uint32(idConcat)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.min((c * 4294967296.0).toLong, 4294967296L))
    val label = splits.init.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), bound)) =>
        Some(acc.fold(when(h < bound, name))(_.when(h < bound, name)))
    }.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn(splitCol, label)
  }

  /** Per-stratum fraction sampling via the same seeded hash: keeps a row
    * iff hash lands in the stratum's fraction of the hash space.
    * Deterministic, single pass, no shuffle at all.
    */
  def stratifiedFraction(df: DataFrame, keyCol: String,
      fractions: Map[String, Double], seed: Long = 42L,
      idCols: Seq[String] = Seq.empty): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val hashCols = if (idCols.nonEmpty) idCols.map(col) else df.columns.toSeq.map(col)
    // map hash to [0,1): shift into non-negative range first
    val u = (xxhash64(lit(seed) +: hashCols: _*) / lit(2.0) + lit(Long.MaxValue / 2.0)) /
      lit(Long.MaxValue.toDouble)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (key, f)) =>
      acc || (col(keyCol) === lit(key) && u < lit(f))
    }
    df.filter(keep)
  }

  /** Training-data MIXTURE construction: draw `total` docs with
    * per-domain quotas proportional to `weightCol` (a per-row column
    * that must be constant within a domain), apportioned by the
    * largest-remainder method — the standard way to turn float mixture
    * ratios ("20% code, 30% web, …") into EXACT integer doc counts
    * that sum to `total` (floor everyone, then +1 to the largest
    * remainders, ties broken by domain name):
    *
    *   base_d = (total · w_d) div W,  rem_d = (total · w_d) mod W
    *   quota_d = base_d + 1 on the (total − Σ base) largest rem_d
    *
    * capped at the domain's doc count (a short domain yields what it
    * has — the capped-mixture relaxation). Selection within a domain
    * is the first `quota_d` rows by `idCol` — deterministic and
    * replayable, the t09-hash-split philosophy for mixtures.
    *
    * Plan at scale: the quota table lives at DOMAIN cardinality — its
    * windows run on a frame of #domains rows (one tiny exchange); the
    * corpus pays ONE exchange on domain for the per-domain row_number
    * and a broadcast join of the quotas. Integer arithmetic only.
    *
    * The single-partition quota windows are safe ONLY because the frame
    * is #domains rows, and `maxDomains` makes that bound enforced
    * rather than assumed: a caller who passes a high-cardinality
    * column (a doc id, a URL) as `domainCol` gets a loud error from
    * the same assert_true machinery as the weight checks — not a
    * silent all-on-one-task window over the corpus. The default
    * admits any real mixture config (training mixtures have tens of
    * domains) with orders of magnitude to spare; raise it explicitly
    * if a legitimate domain space is bigger, and reconsider the
    * broadcast join below at the same time.
    */
  /** Temperature-balanced mixture at α = 0.5 (the multilingual-LM
    * rebalancing convention: domain quotas ∝ n_d^α flatten the head and
    * lift the tail; mBERT used α = 0.7, XLM-R α = 0.3, and α = 0.5 is
    * the square-root schedule) — [[domainMixture]]'s largest-remainder
    * apportionment driven by a DERIVED weight instead of a configured
    * one. α is fixed at 0.5 deliberately: `sqrt` is the one power IEEE
    * 754 specifies as correctly rounded, so the micro-weight
    * `round(√n_d · 10⁶)` is bit-identical on any engine and the whole
    * mixture stays under the hash gate — an arbitrary `pow(n, α)` would
    * be at the mercy of each platform's libm. The count aggregation
    * runs at domain cardinality off a map-side-combined pass; everything
    * downstream is [[domainMixture]]'s one-exchange shape.
    */
  def temperatureMixture(docs: DataFrame, domainCol: String, total: Long,
      idCol: String = "doc_id", maxDomains: Long = 100000L): DataFrame = {
    require(!docs.columns.contains("_tw"),
      "column name _tw is reserved by Sampling.temperatureMixture")
    val weights = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("_dn"))
      .select(col(domainCol),
        round(sqrt(col("_dn").cast("double")) * lit(1000000.0), 0)
          .cast("long").as("_tw"))
    domainMixture(docs.join(broadcast(weights), Seq(domainCol)),
        domainCol, col("_tw"), total, idCol, maxDomains)
      .drop("_tw")
  }

  /** Leakage-safe split: [[hashSplit]] keyed on the near-dup COMPONENT
    * instead of the document — every member of a connected component
    * of `pairs` lands in the SAME split, so a near-duplicate of a
    * training document can never leak into validation or test (the
    * benchmark-contamination failure mode of naive per-doc splits;
    * docs with no near-dup partner split on their own id as before,
    * and because the group key of a singleton IS its id, the label
    * agrees with plain [[hashSplit]] until the doc gains a partner).
    *
    * Scale shape: components come from
    * [[graft.ext.Dedup.clusters]] (O(log diameter) pointer-jumping
    * rounds over the pair graph — pairs cardinality, not corpus²); the
    * corpus pays one hash join against the component labels (near-dup
    * ids only — the label side is a small fraction of the corpus) and
    * the split itself stays one hash + one when-chain per row.
    *
    * @param pairs near-dup pair graph with `id_a`/`id_b` columns (any
    *        pairwise dedup output or a persisted pair-graph artifact)
    * @return docs plus `groupCol` (the split key: component min-id, or
    *         the doc's own id for singletons) and `splitCol`
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: String = "graft",
      splitCol: String = "split", groupCol: String = "group_id"): DataFrame = {
    require(!docs.columns.contains(groupCol),
      s"column name $groupCol collides with Sampling.leakageSafeSplit's group column")
    val labels = graft.ext.Dedup.clusters(pairs)
      .select(col("id").as("_ls_id"), col("cluster_id").as("_ls_cluster"))
    val grouped = docs
      .join(labels, col(idCol) === col("_ls_id"), "left")
      .withColumn(groupCol,
        coalesce(col("_ls_cluster"), col(idCol).cast("long")))
      .drop("_ls_id", "_ls_cluster")
    hashSplit(grouped, Seq(groupCol), splits, seed, splitCol)
  }

  /** Epoch ALLOCATION for a token-budgeted training mix — the planning
    * step after [[temperatureMixture]]/[[domainMixture]] decide
    * shares: given a per-source token inventory (`tokensCol`) and a
    * target budget of `budgetX` × the corpus token total split EVENLY
    * across sources (the diversity-first convention when no curated
    * weights exist), emit per source how many FULL passes to take and
    * the micro-probability of sampling the remainder pass:
    *
    *   target  = (Σ tokens · budgetX) div n_sources
    *   epochs  = target div tokens
    *   frac    = ((target mod tokens) · 10⁶) div tokens
    *
    * All truncating integer arithmetic on non-negative longs — the mix
    * PLAN itself is replayable and sits under a hash gate (t63). The
    * even split means rare sources repeat (epochs > 1, the upsampling
    * a diversity-weighted mix implies) while dominant sources
    * subsample (epochs = 0 plus a fraction). Input is the per-source
    * inventory (source-cardinality sized); everything here is
    * broadcast-scale arithmetic over it — the corpus-sized token count
    * that feeds it is the caller's one scan.
    */
  def epochAllocation(perSource: DataFrame, budgetX: Long = 2L,
      sourceCol: String = "source",
      tokensCol: String = "tokens_avail"): DataFrame = {
    require(budgetX > 0, "budgetX must be positive")
    val tot = perSource.agg(
      sum(col(tokensCol)).as("_tt"), count(lit(1)).as("_ns"))
    perSource.select(col(sourceCol).as("source"),
        col(tokensCol).as("tokens_avail"))
      .crossJoin(tot)
      .withColumn("target_tokens", expr(s"(_tt * $budgetX) div _ns"))
      .withColumn("epochs_full", expr("target_tokens div tokens_avail"))
      .withColumn("frac_micro",
        expr("((target_tokens % tokens_avail) * 1000000) div tokens_avail"))
      .drop("_tt", "_ns")
  }

  def domainMixture(docs: DataFrame, domainCol: String, weightCol: Column,
      total: Long, idCol: String = "doc_id", maxDomains: Long = 100000L): DataFrame = {
    require(total > 0, "total must be positive")
    require(maxDomains > 0, "maxDomains must be positive")
    import org.apache.spark.sql.expressions.Window
    val domains = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("_n"), first(weightCol).cast("long").as("_w"),
        min(weightCol).cast("long").as("_wlo"), max(weightCol).cast("long").as("_whi"))
      // misuse fails loudly instead of returning an empty/arbitrary
      // sample: weights must be constant within a domain, and at least
      // one domain must carry positive weight (else _wsum = 0 and the
      // div/% below would null out every quota). assert_true runs on
      // the #domains-row frame only and lives in a filter so column
      // pruning can't drop it; it returns NULL on success.
      .filter(coalesce(
        assert_true(col("_wlo") === col("_whi"),
          concat(lit("domainMixture: non-constant weight in domain "),
            col(domainCol))), lit(true)))
      .drop("_wlo", "_whi")
    // domain-cardinality frame: W, base, remainder rank, leftover — all
    // windows over #domains rows (empty partitionBy is safe HERE only)
    val all = Window.partitionBy()
    val rankW = Window.partitionBy().orderBy(col("_rem").desc, col(domainCol))
    val quotas = domains
      // NOT "_W": SQL identifiers in expr() are case-insensitive, so
      // "_w" and "_W" would silently resolve to the same column
      .withColumn("_wsum", sum(col("_w")).over(all))
      .withColumn("_ndom", count(lit(1)).over(all))
      .filter(coalesce(
        assert_true(col("_ndom") <= maxDomains,
          concat(lit("domainMixture: domain cardinality "), col("_ndom"),
            lit(s" exceeds maxDomains=$maxDomains — is '$domainCol' really a domain column?"))),
        lit(true)))
      .filter(coalesce(
        assert_true(col("_wsum") > 0L,
          lit("domainMixture: total domain weight must be positive")),
        lit(true)))
      .drop("_ndom")
      .withColumn("_base", expr(s"($total * _w) div _wsum"))
      .withColumn("_rem", expr(s"($total * _w) % _wsum"))
      .withColumn("_left", lit(total) - sum(col("_base")).over(all))
      .withColumn("_rank", row_number().over(rankW))
      .withColumn("_quota",
        least(col("_base") + when(col("_rank") <= col("_left"), 1L).otherwise(0L),
          col("_n")))
      .select(col(domainCol), col("_quota"))
    val perDomain = Window.partitionBy(col(domainCol)).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(perDomain))
      .join(broadcast(quotas), Seq(domainCol))
      .filter(col("_rn") <= col("_quota"))
      .drop("_rn", "_quota")
  }
}
