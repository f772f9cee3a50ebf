package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting (on by default in [[graft.GraftSession]])
  * handles most runtime skew; these helpers cover the cases AQE can't:
  * a single hot aggregation key, and broadcast-impossible joins against
  * a hot key set. Salting is deterministic (hash-derived, no rand()) so
  * reruns and retries produce identical partitioning.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the whole row — uniform
    * regardless of key skew, stable across retries.
    */
  def saltCol(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase skew-proof sum: partial aggregate on (keys, salt) — at
    * most `buckets` partial rows per hot key per shuffle partition —
    * then final aggregate on keys. Result is identical to a direct
    * groupBy/sum (decimal/long sums; double sums differ only by fp
    * association, as with any repartitioning).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(df, buckets))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Pre-join skew report — the diagnostic you run BEFORE committing a
    * 100 TB equi-join: per join-key value, both sides' row counts, the
    * key's exact inner-join output contribution (`n_left · n_right`),
    * and the salt factor [[saltedJoin]] would need to hold that key's
    * output under `targetRowsPerTask` rows per task
    * (`ceil(est_out / target)` in pure integer arithmetic). Keys are
    * ranked by contribution (ties by key) and cut to `topN` — the
    * hot-key shortlist that decides between broadcast, AQE skew split,
    * and explicit salting.
    *
    * Scale shape: the fact rows are never joined — each side collapses
    * to a (key, count) table first (partial aggregation makes the
    * shuffle carry one row per key per map partition), the join runs at
    * KEY cardinality, and the top-N cut is a TakeOrderedAndProject, not
    * a global sort. Everything is BIGINT, so the report itself
    * hash-gates.
    */
  def joinSkewReport(left: DataFrame, right: DataFrame, key: String,
      targetRowsPerTask: Long = 1000000L, topN: Int = 20): DataFrame = {
    require(targetRowsPerTask >= 1, "targetRowsPerTask must be >= 1")
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    lc.join(rc, key)
      .withColumn("est_out", col("n_left") * col("n_right"))
      .withColumn("salt_buckets",
        expr(s"(est_out + ${targetRowsPerTask - 1}L) div ${targetRowsPerTask}L"))
      .orderBy(col("est_out").desc, col(key))
      .limit(topN)
  }

  /** Skewed equi-join: the large (skewed) side gets a deterministic salt,
    * the small side is replicated once per salt value; the join key
    * becomes (key, salt) so a hot key spreads over `buckets` tasks.
    * Inner-join semantics are unchanged.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt", saltCol(large, buckets))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Measurement-driven salting: [[saltedJoin]] with a PER-KEY salt
    * factor taken from a [[joinSkewReport]] instead of one global
    * bucket count — the advisor's output consumed as the plan input.
    * Hot keys spread over exactly their recommended `salt_buckets`
    * tasks; keys absent from the report (below the top-N cut, or
    * report computed on a sample) default to 1 — unsalted, no
    * replication cost. [[saltedJoin]]'s uniform factor pays
    * `buckets ×` replication on EVERY small-side row; this pays it
    * only where measurement says it helps, which is the difference
    * between "salting the join" and "salting the three keys that
    * matter" on a 100 TB zipfian key set.
    *
    * `report` needs (key, salt_buckets); it is broadcast (top-N sized
    * by construction). Inner-join semantics are unchanged vs the
    * direct join (spec-pinned); the salt is deterministic whole-row
    * hash, stable across retries.
    */
  def adaptiveSaltedJoin(large: DataFrame, small: DataFrame, key: String,
      report: DataFrame): DataFrame = {
    val factors = broadcast(report.select(col(key),
      col("salt_buckets").cast("long").as("__nb")))
    val saltedLarge = large
      .join(factors, Seq(key), "left")
      .withColumn("__nbf", coalesce(col("__nb"), lit(1L)))
      .withColumn("__salt",
        pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), col("__nbf")))
      .drop("__nb", "__nbf")
    val replicatedSmall = small
      .join(factors, Seq(key), "left")
      .withColumn("__salt",
        explode(sequence(lit(0L), coalesce(col("__nb"), lit(1L)) - 1L)))
      .drop("__nb")
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
