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
}
