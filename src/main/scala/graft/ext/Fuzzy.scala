package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance (levenshtein) string matching — the record-linkage /
  * entity-resolution family: set-similarity joins (Jaccard,
  * containment, MinHash) handle token-level near-duplication, but
  * catalog reconciliation, typo'd identifier matching, and scraped-name
  * canonicalization need CHARACTER-level distance.
  *
  * Semantics are exact: `fuzzyJoin` returns ALL pairs with
  * `levenshtein(a, b) <= maxDist` — the filtering is candidate
  * PRUNING, never candidate loss, so the DuckDB cross-join oracle gates
  * completeness, not just precision. Three provably-safe filters
  * (Gravano et al., VLDB 2001; Ed-Join, Xiao et al., VLDB 2008):
  *
  *  - length: `ed(a,b) <= d` forces `|len(a) - len(b)| <= d`;
  *  - count: one edit destroys at most q of a string's positional
  *    q-grams, so `ed <= d` forces a multiset q-gram overlap of at
  *    least `max(len)-q+1 - q*d`;
  *  - prefix: order every (gram, occurrence) element by corpus
  *    document frequency ascending (rarest first, ties by gram then
  *    occurrence — any global total order is sound, the RARE-first
  *    order is what bounds candidates); if the multiset overlap meets
  *    the count bound, the first `q*d + 1` elements of each side must
  *    intersect. Candidates therefore come from an equi-join on the
  *    RARE grams only — hot grams ("Brand", " ") never fan out.
  *
  * The count bound is vacuous when `max(len) <= q*d + q - 1`; pairs of
  * two such short strings route through a length-band equi-join
  * instead (short strings are a bounded slice of any real corpus).
  * At 100 TB the shape is batch-side prefix grams equi-joined against
  * the corpus prefix-gram index (q*d+1 rows per corpus string —
  * persistable like the minhash/LSH index artifacts), then one
  * codegen'd `levenshtein` verify over candidate-sized survivors.
  */
object Fuzzy {

  /** Character q-grams with occurrence index, multiset-as-set encoding:
    * "aabab" q=2 → (aa,1),(ab,1),(ba,1),(ab,2) — joining on
    * (gram, occ) computes Σ_g min(countA, countB), the multiset
    * overlap. Output: (idCol, strCol, len, gram, occ).
    */
  private[ext] def qgramRows(df: DataFrame, q: Int, strCol: String,
      idCol: String): DataFrame = {
    val withLen = df.select(col(idCol), col(strCol),
      length(col(strCol)).as("_len"))
    withLen
      .select(col(idCol), col(strCol), col("_len"),
        explode(expr(s"transform(sequence(1, greatest(_len - ${q - 1}, 0)), " +
          s"p -> substring($strCol, p, $q))")).as("gram"))
      .withColumn("occ", row_number().over(
        Window.partitionBy(col(idCol), col("gram")).orderBy(col("gram"))))
  }

  /** All (id_a, id_b, dist) pairs with `levenshtein <= maxDist`,
    * length-band equi-join implementation: the NAIVE twin (all pairs
    * within a length band are verified). Complete by the length
    * filter alone; quadratic within bands — the from-scratch
    * cross-check for [[fuzzyJoin]] and the probe baseline.
    */
  def fuzzyJoinBand(left: DataFrame, right: DataFrame, maxDist: Int,
      leftCol: String = "s", rightCol: String = "s",
      leftId: String = "id", rightId: String = "id"): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val l = left.select(col(leftId).as("id_a"), col(leftCol).as("_sa"),
        explode(sequence(greatest(length(col(leftCol)) - maxDist, lit(0)),
          length(col(leftCol)) + maxDist)).as("_blen"))
    val r = right.select(col(rightId).as("id_b"), col(rightCol).as("_sb"),
      length(col(rightCol)).as("_blen"))
    // each (a, b) pair matches exactly one banded length (b's), so no
    // post-join dedup is needed
    l.join(r, "_blen")
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** All (id_a, id_b, dist) pairs with `levenshtein <= maxDist` —
    * Ed-Join-style: rare-gram prefix candidates + length filter + one
    * exact verify; short×short pairs via the band join. Identical
    * output to [[fuzzyJoinBand]] (spec- and oracle-pinned), sub-
    * quadratic candidates.
    *
    * @param q q-gram width (2 is the classic choice for short strings)
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame, maxDist: Int,
      q: Int = 2, leftCol: String = "s", rightCol: String = "s",
      leftId: String = "id", rightId: String = "id"): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(q >= 2, "q must be at least 2")
    if (maxDist == 0) { // degenerate: exact equality, one equi-join
      return left.select(col(leftId).as("id_a"), col(leftCol).as("_s"))
        .join(right.select(col(rightId).as("id_b"), col(rightCol).as("_s")), "_s")
        .select(col("id_a"), col("id_b"), lit(0).as("dist"))
    }
    val prefixLen = q * maxDist + 1
    // the count bound max(len)-q+1-q*d is vacuous iff max(len) <= short
    val short = q * maxDist + q - 1

    // corpus-side document frequency defines the global gram order;
    // left grams absent from the corpus get df 0 (rarest — any
    // CONSISTENT order is sound, shared grams agree by construction)
    val rGrams = qgramRows(right, q, rightCol, rightId)
    val dfTable = rGrams.filter(col("occ") === 1)
      .groupBy(col("gram")).agg(count(lit(1)).as("_df"))

    def prefix(grams: DataFrame, id: String, s: String): DataFrame =
      grams.join(dfTable, Seq("gram"), "left")
        .withColumn("_rank", row_number().over(
          Window.partitionBy(col(id))
            .orderBy(coalesce(col("_df"), lit(0L)), col("gram"), col("occ"))))
        .filter(col("_rank") <= prefixLen)
        .select(col(id), col(s), col("_len"), col("gram"), col("occ"))

    val lPre = prefix(qgramRows(left, q, leftCol, leftId), leftId, leftCol)
      .withColumnRenamed(leftId, "id_a").withColumnRenamed(leftCol, "_sa")
      .withColumnRenamed("_len", "_la")
    val rPre = prefix(rGrams, rightId, rightCol)
      .withColumnRenamed(rightId, "id_b").withColumnRenamed(rightCol, "_sb")
      .withColumnRenamed("_len", "_lb")

    val longCand = lPre.join(rPre, Seq("gram", "occ"))
      .filter(abs(col("_la") - col("_lb")) <= maxDist)
      .select(col("id_a"), col("_sa"), col("id_b"), col("_sb"))
      .distinct()

    // short×short pairs (count bound vacuous — can share zero grams)
    val shortCand = left.filter(length(col(leftCol)) <= short)
      .select(col(leftId).as("id_a"), col(leftCol).as("_sa"),
        explode(sequence(greatest(length(col(leftCol)) - maxDist, lit(0)),
          length(col(leftCol)) + maxDist)).as("_blen"))
      .join(right.filter(length(col(rightCol)) <= short)
        .select(col(rightId).as("id_b"), col(rightCol).as("_sb"),
          length(col(rightCol)).as("_blen")), "_blen")
      .select(col("id_a"), col("_sa"), col("id_b"), col("_sb"))
      .distinct()

    // thresholded verify: the DP early-exits past maxDist (returns -1)
    longCand.unionByName(shortCand).distinct()
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Entity resolution: each left (dirty) record's best catalog match —
    * min distance, ties by catalog id — over the [[fuzzyJoin]] pair
    * set. Unmatched records are absent (the caller's drop/queue
    * policy). Output: (id_a, match_id, dist, n_candidates).
    */
  def entityMatch(dirty: DataFrame, catalog: DataFrame, maxDist: Int,
      q: Int = 2, dirtyCol: String = "s", catalogCol: String = "s",
      dirtyId: String = "id", catalogId: String = "id"): DataFrame = {
    val pairs = fuzzyJoin(dirty, catalog, maxDist, q,
      dirtyCol, catalogCol, dirtyId, catalogId)
    val w = Window.partitionBy(col("id_a")).orderBy(col("dist"), col("id_b"))
    pairs
      .withColumn("n_candidates", count(lit(1)).over(Window.partitionBy(col("id_a"))))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("id_a"), col("id_b").as("match_id"), col("dist"),
        col("n_candidates"))
  }
}
