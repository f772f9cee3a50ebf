package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the scale alternates to the exact forms the
  * oracle gate verifies (q06 exact distinct, q14 exact percentiles).
  *
  * At 100 TB the exact forms carry state proportional to the data:
  * `count(DISTINCT x)` shuffles every distinct value and
  * `percentile(x, f)` buffers every value per group. These cap the
  * state at kilobytes per group — HyperLogLog++ registers for distinct
  * counts, a KLL/GK-style quantile sketch for percentiles — at a
  * declared, tunable accuracy. Both are Catalyst built-ins (codegen'd,
  * map-side partially aggregated, deterministic for a fixed input);
  * this wrapper exists to name the trade-off and pin the error bounds
  * in OpsSpec so "switch to the sketch" is a reviewed, tested step,
  * not an ad-hoc query edit.
  */
object Approx {

  /** HyperLogLog++ distinct count; `rsd` is the target relative
    * standard deviation (Spark default 0.05 — ~1.5 KB of registers).
    */
  def distinctCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Sketch-based percentiles; `accuracy` trades memory for error — the
    * rank error is bounded by 1/accuracy of the row count.
    */
  def percentiles(c: Column, fractions: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c,
      array(fractions.map(lit): _*),
      lit(accuracy))

  /** q06's shape with bounded state: distinct customers per table scan. */
  def distinctCustomers(orders: DataFrame, rsd: Double = 0.05): DataFrame =
    orders.agg(distinctCount(col("o_custkey"), rsd).as("cnt"))

  /** Heavy hitters with bounded memory: per-partition SPACE-SAVING
    * summaries (capacity-bounded counter sets with deterministic
    * smallest-(count, token) eviction; an evicted slot's successor
    * inherits the evicted count as its overestimation error), merged by
    * summing counts and error bounds per token across partitions. The
    * classic guarantees hold per partition and survive the additive
    * merge: `est − err ≤ true ≤ est`, and every token whose true
    * partition frequency exceeds n_p/capacity is present in that
    * partition's summary — so a GLOBAL heavy hitter (freq > n/capacity)
    * is present in at least one summary and reported.
    *
    * State is O(capacity) per partition — at 100 TB the exact
    * `groupBy(token).count` shuffles every distinct token (content-scale
    * cardinality for web corpora); this shuffles ≤ capacity rows per
    * partition regardless of input size. The counter set is a
    * TreeMap[(count, token)] twin-indexed by a HashMap, so increment and
    * eviction are O(log capacity), not an O(capacity) scan per row.
    *
    * With `capacity ≥` the per-partition distinct count, no eviction
    * ever fires: every count is exact, every error 0, and the merged
    * top-k equals the exact top-k — the recall-saturating configuration
    * the t17 gate replays in SQL (tight-capacity error bounds are
    * spec-gated in OpsSpec).
    */
  def spaceSavingTopK(items: DataFrame, itemCol: String, k: Int,
      capacity: Int): DataFrame = {
    require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")
    val spark = items.sparkSession
    import spark.implicits._
    val partial = items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val byToken = scala.collection.mutable.HashMap[String, (Long, Long)]()
        val byCount = scala.collection.mutable.TreeMap[(Long, String), Unit]()
        it.foreach { t =>
          byToken.get(t) match {
            case Some((c, e)) =>
              byCount.remove((c, t))
              byToken(t) = (c + 1, e)
              byCount((c + 1, t)) = ()
            case None if byToken.size < capacity =>
              byToken(t) = (1L, 0L)
              byCount((1L, t)) = ()
            case None =>
              val ((minC, minT), _) = byCount.head
              byCount.remove((minC, minT))
              byToken.remove(minT)
              byToken(t) = (minC + 1, minC)
              byCount((minC + 1, t)) = ()
          }
        }
        byToken.iterator.map { case (t, (c, e)) => (t, c, e) }
      }.toDF("token", "cnt", "e")
    partial.groupBy("token")
      .agg(sum("cnt").as("est"), sum("e").as("err"))
      .orderBy(col("est").desc, col("token")).limit(k)
  }
}
