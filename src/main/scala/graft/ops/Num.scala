package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric conventions shared by the gated
  * queries and their DuckDB oracles.
  */
object Num {

  /** Round a double to 6 places, deterministically across engines:
    * `floor(x·10⁶ + 0.5) / 10⁶` as pure IEEE double operations, which
    * Spark and DuckDB (and any IEEE-754 engine) evaluate bit-identically.
    *
    * Why not `round(x, 6)`: Spark's Round on a double quantizes the
    * SHORTEST DECIMAL STRING of the value (BigDecimal.valueOf) with
    * HALF_UP, while DuckDB rounds the BINARY value — on ratios whose
    * shortest repr ends in a 7th-digit 5 (e.g. 333/640 = 0.5203125)
    * they disagree by one cell (Spark 0.520313, DuckDB 0.520312): the
    * same divergence class as the r12 q49 money red, sitting under
    * every round-6'd similarity/jaccard/containment score, waiting for
    * a fixture regeneration to surface it. The floor spelling is a
    * pure function of the double, so both engines agree on EVERY
    * input; the oracle SQL spells the identical
    * `floor((x) * 1000000 + 0.5) / 1000000`.
    *
    * Semantics: half-up toward +∞ (for negative scores this differs
    * from HALF_UP-away-from-zero at exact ties — deterministic, which
    * is the property the hash gate needs). Precondition: |x|·10⁶ must
    * stay below 2^53 (i.e. |x| ≲ 9·10⁹) so every step is
    * exact-or-correctly-rounded — callers range from [−1, 1] scores
    * and [0, 1] ratios up to ~10⁵ magnitudes (q14 percentile prices,
    * q17 moving averages), all far inside the bound; above it the
    * +0.5 would be absorbed and the floor could land one ULP off.
    */
  def round6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
}
