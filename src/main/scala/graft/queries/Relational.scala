package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num.round6

/** Native relational surface (SURVEY.md §2.13 Q1–Q10).
  *
  * Everything here is pure declarative DataFrame algebra — predicate
  * pushdown, column pruning, join selection, partial aggregation and
  * whole-stage codegen all come from Catalyst unmodified (SURVEY §4).
  *
  * Determinism contract with the DuckDB oracle:
  *   - every query is totally ordered (full tiebreaker key) so row order
  *     is reproducible;
  *   - money-valued SUMs go through DecimalType so addition is exact and
  *     associative (a double sum's value depends on partitioning — it
  *     would hash-mismatch a single-threaded oracle run);
  *   - all output columns are explicitly aliased to match the oracle SQL.
  *
  * Scale notes (100 TB): each query is a scan→(filter/project)→shuffle
  * agg/join shape. Aggregations are hash-based with map-side partial
  * aggregation; joins on small dims (nation/region/customer at fixture
  * scale) are broadcast by Catalyst via AQE; no driver-side collect
  * anywhere.
  */
object Relational {

  // ── Money in the exact decimal domain (the r12 q49 rounding-tie fix) ──
  // Every testdata money double round-trips DECIMAL(18,2) exactly
  // (verified for l_extendedprice / l_discount / l_tax / l_quantity /
  // o_totalprice / c_acctbal / p_retailprice / events.value), so casting
  // a RAW COLUMN to decimal is tie-free on both engines. What is NOT
  // tie-free is casting a double PRODUCT: Spark rounds the shortest
  // decimal string of the double (HALF_UP) while DuckDB rounds the
  // binary value, and products can land on a .00005 scale-4 boundary —
  // that divergence was the q49 hash red. The convention below multiplies
  // IN the decimal domain instead: factors cast first (tie-free),
  // products exact (scale 4 for two factors, 6 for three), sums exact.
  // The only rounding left is one HALF_UP rescale per GROUP for scale-6
  // sums — Spark's decimal cast and DuckDB's round(x, 4) are both
  // half-away-from-zero on the same exact decimal, so they agree — and
  // the final decimal→double casts stay below 2^53 unscaled, where both
  // engines produce the identical correctly-rounded double.
  private val Money = DecimalType(18, 2)
  private val Pct = DecimalType(4, 2)
  private def asMoney(c: Column): Column = c.cast(Money)
  /** 1 − pct and 1 + pct as exact DECIMAL(5,2). */
  private def oneMinusPct(c: Column): Column = lit(1).cast(Pct) - c.cast(Pct)
  private def onePlusPct(c: Column): Column = lit(1).cast(Pct) + c.cast(Pct)
  /** l_extendedprice · (1 − l_discount) — DECIMAL(24,4), exact per row. */
  private def discPrice: Column =
    asMoney(col("l_extendedprice")) * oneMinusPct(col("l_discount"))
  // The oracle SQL twin of discPrice is spelled inline in each oracle:
  //   CAST(l_extendedprice AS DECIMAL(18,2))
  //     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
  // — same exact decimal value on DuckDB.

  /** Q1 scan + filter + project; filter and both columns push to parquet. */
  def q01ScanFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_extendedprice"))

  /** Q2 TPC-H Q1-style grouped aggregate (map-side partial agg → 2-phase hash agg). */
  def q02AggGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q3 equi-join + agg; nation is tiny → Catalyst broadcasts it. */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("n_name"))

  /** Q4 star-schema 4-way join; dims broadcast, fact streams. */
  def q04StarJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy(col("r_name"))

  /** Q5 anti-join (customers with no orders) — left_anti, not NOT IN-collect. */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt"))

  /** Q6 exact distinct count (2-phase: partial distinct per partition, then merge). */
  def q06Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(countDistinct(col("o_custkey")).as("cnt"))

  /** Q7 top-k: global sort + limit → Spark TakeOrderedAndProject (no full sort at scale). */
  def q07TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Q8 window: first order per customer (row_number over partitioned window). */
  def q08Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"))
      .orderBy(col("o_custkey"))
  }

  /** Q9 timestamp filter + grouped agg over the events table.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS) → read as LongType epoch
    * nanos (see [[graft.GraftSession]]); the filter compares against the
    * equivalent nanosecond constant so it still pushes down to the scan.
    */
  def q09Events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit(1704844800000000000L)) // 2024-01-10T00:00:00Z as epoch ns
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy(col("event_type"))

  /** Q10 set op: INTERSECT (distinct semantics in both Spark and the oracle). */
  def q10Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** Q11 rollup: subtotals per (flag, status), per flag, and grand total.
    * Grouping nulls are coalesced to 'ALL' so null-ordering differences
    * between engines can't bite.
    */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("flag"), col("status"))

  /** Q12 running aggregate: cumulative spend per customer over order time. */
  def q12Running(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q13 gaps-and-islands sessionization (batch): a session ends after a
    * 30-minute silence. Same windowed cumulative-flag construction any
    * SQL engine can express — the streaming `session_window` twin lives
    * in graft.streaming.
    */
  def q13Sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapNs = 1800000000000L // 30 min in ns (ts is epoch-nanos)
    Tables.events(spark, dir)
      .withColumn("new_session",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > gapNs, 1)
          .when(lag(col("ts"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("session_id")).as("n_sessions"), count(lit(1)).as("cnt"))
      .orderBy(col("user_id"))
  }

  /** Q14 exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`; `percentile_approx` would not hash-match an
    * exact oracle). Rounded to 6dp to absorb fp representation drift.
    */
  def q14Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        // one percentile() call per COLUMN (array of fractions): each call
        // buffers the column's values once, so fusing p50/p90 halves the
        // aggregation state for l_quantity
        expr("percentile(l_quantity, array(0.5, 0.9))").as("p_qty"),
        expr("percentile(l_extendedprice, array(0.95))").as("p_price"))
      .select(col("l_returnflag"),
        round6(element_at(col("p_qty"), 1)).as("p50_qty"),
        round6(element_at(col("p_qty"), 2)).as("p90_qty"),
        round6(element_at(col("p_price"), 1)).as("p95_price"))
      .orderBy(col("l_returnflag"))

  /** Q15 correlated EXISTS — planned as a left_semi join (no subquery
    * re-execution per row): customers with at least one urgent order,
    * counted per market segment.
    */
  def q15Exists(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("c_mktsegment"))

  /** Q16 pivot: per-user event counts spread to one column per event
    * type (explicit value list keeps the schema deterministic; counts
    * coalesced to 0 to match SQL conditional aggregation).
    */
  def q16Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  /** Q17 RANGE-frame window: 30-day trailing average spend per customer.
    * The frame is value-based (all orders within 29 days), not row-based
    * — ties and gaps in order dates are handled identically by any
    * engine, unlike a ROWS frame. Sum runs in Decimal so the average is
    * partition-order independent.
    */
  def q17MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"))
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        round6(sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double") /
          count(lit(1)).over(w)).as("avg_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q18 range join: orders matched to half-open promo periods. The
    * period table is tiny and explicitly broadcast, so the inequality
    * join is a broadcast nested-loop over a handful of rows per order —
    * the only plan that doesn't blow up at fact-table scale (a shuffle
    * range join would cross-product within key-less partitions).
    * Half-open [start, end) bounds sidestep date-vs-timestamp midnight
    * semantics differing between engines.
    */
  def q18RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val periods = Seq(
      ("1996-H2", "1996-07-01", "1997-01-01"),
      ("1997-H1", "1997-01-01", "1997-07-01"),
      ("1997-H2", "1997-07-01", "1998-01-01"),
      ("1998-H1", "1998-01-01", "1998-07-01"))
      .toDF("period", "start_d", "end_d")
      .select(col("period"),
        col("start_d").cast("timestamp").as("start_d"),
        col("end_d").cast("timestamp").as("end_d"))
    Tables.orders(spark, dir)
      .join(broadcast(periods),
        col("o_orderdate") >= col("start_d") && col("o_orderdate") < col("end_d"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy(col("period"))
  }

  /** Q19 skew-proof aggregation via [[graft.ops.Skew.saltedSum]]: the
    * two-phase (key, salt) → key plan bounds any hot key's partial rows
    * per shuffle partition. lineitem's 3-value l_returnflag IS the hot
    * key case. Decimal sums make the salted result bit-identical to the
    * direct groupBy the oracle runs.
    */
  def q19SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedSum(
        Tables.lineitem(spark, dir)
          .select(col("l_returnflag"), col("l_quantity").cast(DecimalType(18, 2)).as("qty")),
        Seq("l_returnflag"), "qty", buckets = 16)
      .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** Q20 NATIVE session windows: Spark's `session_window` — the same
    * operator the streaming pipeline uses — run in batch under the
    * oracle gate. Semantics: an event merges into the current session
    * whenever its distance from the last event is ≤ gap — an EXACT-gap
    * successor merges (Spark's UpdatingSessionsIterator splits only on
    * start strictly past the current end), producing the same islands
    * as q13's `diff > gap` rule — and the session end is last event +
    * gap. ts is floored ns→µs on both
    * sides; sums run in Decimal for partition-order independence.
    */
  def q20SessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val gap = "30 minutes"
    Tables.events(spark, dir)
      .withColumn("tsx", graft.functions.Cols.nanosToTs(col("ts")))
      .groupBy(col("user_id"), session_window(col("tsx"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("sess_start_us"),
        unix_micros(col("sw.end")).as("sess_end_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }

  /** Q21 Bloom-prefiltered join ([[graft.ops.Prefilter.bloomSemiJoin]]):
    * lineitem joined to the few highest-value orders. The Bloom filter
    * over the surviving order keys prunes non-matching lineitem rows
    * before any exchange — the semi-join reduction that keeps a
    * fact-table join affordable when the dim side is filtered-small but
    * not plan-time-provably so. False positives die in the real join,
    * so the result is bit-identical to the oracle's plain join.
    */
  def q21BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    // sizing hint: an upper bound on surviving orders at any tested SF —
    // skips the defaulted count() job (one full orders scan per run);
    // an undercount would only raise the filter's fpp, never lose rows
    graft.ops.Prefilter.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey",
        expectedItems = 1 << 20)
      .join(hot, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q22 CUBE: all 2^k grouping-set combinations in one pass — the
    * grouping-sets surface q11's ROLLUP doesn't exercise (rollup emits
    * only the k+1 prefix sets). Same single-shuffle expand-based plan.
    */
  def q22Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("flag"), col("status"))

  /** Q24 explicit GROUPING SETS — the third member of the grouping
    * family (q11 rollup, q22 cube): two independent single-column
    * rollups + grand total in ONE pass (Spark 4's native
    * `groupingSets` API → a single Expand + one exchange, where three
    * separate groupBys would scan and shuffle three times).
    */
  def q24GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("flag"), col("status"))

  /** Q25 RANGE window frame — the frame type q12 (rows frame) and q17
    * (moving avg) don't cover: per customer, revenue and order count
    * over a trailing 30-DAY value range, not a row count. Ordering is
    * epoch seconds (integer), so frame membership is integer
    * comparison in both engines, and RANGE frames are peer-inclusive —
    * same-timestamp orders see identical frames, so ties are
    * deterministic with no extra tie-break key. Money through
    * DecimalType (the q02 exactness rule). One shuffle + one sort.
    */
  def q25RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ts"))
      .rangeBetween(-2592000L, Window.currentRow)
    Tables.orders(spark, dir)
      // o_orderdate is TIMESTAMP_NTZ — no direct long cast; the session
      // is pinned UTC (GraftSession), so NTZ→TZ→epoch matches DuckDB's
      // naive-as-UTC epoch()
      .withColumn("ts", col("o_orderdate").cast("timestamp").cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("ts"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("rev_30d"),
        count(lit(1)).over(w).as("n_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q26 unpivot (melt): a wide per-flag aggregate spread back to long
    * (measure, value) rows — the inverse of q16's pivot, via Spark's
    * native `unpivot` (ONE Expand node over the aggregated rows — no
    * UNION rescan of the fact table; a UNION ALL spelling would scan
    * lineitem once per measure). Sums run in Decimal first (the q02
    * exactness rule) so the melted doubles are partition-order
    * independent; the oracle melts with a values-list UNION over the
    * same one-pass aggregate CTE.
    */
  def q26Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("price"),
        sum(col("l_discount").cast(DecimalType(18, 2))).cast("double").as("disc"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** Q28 one-pass column profile ([[graft.ops.Profiler]]): per-column
    * nulls / exact distincts / serialized min-max over orders, in ONE
    * scan (the N count-distincts plan as a single Expand with partial
    * aggs — not N scans). The oracle recomputes every stat per column
    * and unions them in the same (column, stats) shape.
    *
    * SCHEMA COUPLING: the oracle SQL hardcodes the six orders columns
    * while [[graft.ops.Profiler.profile]] derives the column set from
    * the live fixture schema — a regenerated fixture that adds/drops an
    * orders column would surface as an opaque row-count mismatch. The
    * assert below turns that into a descriptive error at the query
    * instead (fixture schema drift is a known recurring event; the
    * events.ts encoding has already flipped once).
    */
  def q28ColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val expected = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    require(orders.columns.toSeq == expected,
      s"q28 oracle SQL hardcodes orders columns $expected but the fixture has " +
        s"${orders.columns.toSeq} — update the q28_column_profile oracle to match")
    graft.ops.Profiler.profile(orders)
      .orderBy(col("column"))
  }

  /** Q28a — the 100× twin of q28: an APPROX profile with NO Expand.
    * r13: now [[graft.ops.Profiler.profileKmv]] (KMV distinct
    * estimates over the 60-bit md5 hash — pure integer functions of
    * the input) instead of HLL++, so the approx path itself is
    * rows+schema+hash gated against a DuckDB replay (the d26 KMV
    * convention) — no more rows-only `no_oracle` row in the
    * correctness artifact. The HLL++ spelling
    * ([[graft.ops.Profiler.profileApprox]]) stays in the library as
    * the sketch-size-optimal variant; its ≤ 2 % per-column error is
    * still pinned in SkewAndBucketSpec and re-measured against the
    * exact profile every bench run (`hll_profile_max_err`).
    */
  def q28aProfileApprox(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Profiler.profileKmv(Tables.orders(spark, dir))
      .orderBy(col("column"))

  /** Q30 — the TPC-H Q3 "shipping priority" shape: three-table
    * fact⋈fact⋈dim join with selective predicates on EVERY input
    * (segment on customer, date cutoffs on orders and lineitem), a
    * revenue aggregate per order, and a top-10. The plan the 100 TB
    * version needs is exactly what Catalyst produces from this
    * declaration: all three filters push to the parquet scans
    * (lineitem's shipdate cutoff prunes the fact scan BEFORE the join),
    * the segment-filtered customer broadcasts, and the top-10 runs as
    * TakeOrdered, never a global sort. Revenue follows the q02 decimal
    * convention; the order date is surfaced as an epoch-day long (the
    * q17 pattern) so the output is cross-engine-stable; ties at the
    * limit boundary break on l_orderkey in both engines.
    */
  def q30ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("o_day"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q29 correlated aggregate (the "above the group's norm" shape SQL
    * writes as a correlated subquery): customers whose lifetime order
    * value exceeds 2× their NATION's per-customer average. Decorrelated
    * into two aggregations + a broadcast join — the plan Catalyst's
    * subquery decorrelation would produce, declared directly: per-
    * customer totals (one map-side-combined agg over orders), per-
    * nation (sum, count) of those totals (nation-cardinality, tiny →
    * broadcast), and the avg comparison cross-multiplied to
    * `total · n_cust > 2 · nation_sum` so the filter stays in EXACT
    * decimal arithmetic — no division, no float drift for boundary
    * customers. Money follows the q02 convention: per-row cast to
    * DECIMAL(18,2), exact decimal sum, double only on output.
    */
  def q29Correlated(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("cust_total"))
    val joined = totals.join(
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
      col("o_custkey") === col("c_custkey"))
    val natAgg = joined.groupBy(col("c_nationkey"))
      .agg(sum(col("cust_total")).as("nat_sum"), count(lit(1)).as("n_cust"))
    joined.join(broadcast(natAgg), Seq("c_nationkey"))
      .filter(col("cust_total") * col("n_cust") > col("nat_sum") * lit(2))
      .select(col("c_custkey"), col("cust_total").cast("double").as("cust_total"))
      .orderBy(col("c_custkey"))
  }

  /** Q31 TPC-H Q18 shape (large-volume orders): `HAVING sum(qty) > K`
    * over lineitem, then the surviving order keys pull in orders +
    * customer. Declared as aggregate-THEN-join, which is the scale
    * shape SQL's `IN (GROUP BY … HAVING …)` decorrelates to: the fact
    * table is touched once with map-side partial aggregation; the
    * HAVING filter is applied to the aggregate (order-cardinality, and
    * selective — ~0.05% of orders at the fixture's quantity
    * distribution), and only then joined. At 100 TB the filtered key
    * set is small enough that AQE converts both joins to broadcasts at
    * runtime — nothing here forces a shuffle of the full orders table.
    * Quantities are integral-valued doubles; summed in DECIMAL so the
    * HAVING boundary is exact cross-engine.
    */
  def q31LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
      .filter(col("qty") > lit(300))
    bigOrders
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("o_day"),
        col("o_totalprice"),
        col("qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q32 TPC-H Q21 shape (sole failing supplier) re-expressed without
    * the double correlated EXISTS/NOT EXISTS: suppliers who were the
    * ONLY supplier with a returned line (`l_returnflag = 'R'`) on an
    * order served by several suppliers. SQL writes this as two
    * correlated subqueries against lineitem (3 scans); here the same
    * predicate is per-order arithmetic — collapse lineitem to one row
    * per (order, supplier) with a "had a return" flag, then count
    * suppliers and returning suppliers per order in a window, and keep
    * flag=1 ∧ n_supp≥2 ∧ n_ret=1. ONE scan of the fact table, one
    * shuffle to the (order,supplier) grain, one to order grain; every
    * later step runs at supplier-pair cardinality. No self-join of
    * lineitem survives — the 100 TB difference between this plan and
    * the textbook EXISTS form.
    */
  def q32SoleFailing(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", lit(1)).otherwise(lit(0)))
        .as("has_r"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_ret", sum(col("has_r")).over(w))
      .filter(col("has_r") === 1 && col("n_supp") >= 2 && col("n_ret") === 1)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("suppkey"))
      .limit(25)
  }

  /** Q27 bucketed co-located join ([[graft.ops.Bucketing]]): both join
    * sides are written `bucketBy(8, key).sortBy(key)` ONCE per session
    * (amortized over every later join on the key — the 100 TB answer
    * to a repeated fact⋈fact join), then the sort-merge join reads the
    * catalog's bucket spec and shuffles NEITHER side (no Exchange on
    * either join input — pinned in PlanSpec). The gate compares the
    * join's aggregate against the plain-SQL join, proving the bucketed
    * layout is execution-strategy-invisible to results.
    */
  def q27BucketJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Bucketing
    // table names carry the sf-dir fingerprint so sessions touching
    // several SFs (tests) never read a stale layout
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val (ot, ct) = (s"graft_b_orders_$tag", s"graft_b_customer_$tag")
    if (!spark.catalog.tableExists(ot))
      Bucketing.writeBucketed(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        ot, "o_custkey", 8)
    if (!spark.catalog.tableExists(ct))
      Bucketing.writeBucketed(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        ct, "c_custkey", 8)
    Bucketing.bucketedJoin(spark, ot, "o_custkey", ct, "c_custkey")
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy(col("mktsegment"))
  }

  /** Q23 navigation windows: lag/lead/first_value over the per-customer
    * order timeline — value-passthrough window functions (no arithmetic,
    * so cross-engine exact). One shuffle on o_custkey, one sort.
    */
  def q23WindowNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderkey")).over(w).as("first_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q33 TPC-H Q13 shape (customer order-count distribution): how many
    * customers placed exactly N qualifying orders, INCLUDING N = 0 —
    * the left-outer-preserving count that a plain `GROUP BY o_custkey`
    * silently drops. Scale shape: orders is aggregated to customer
    * grain FIRST (one fact scan, map-side partial agg), and only the
    * per-customer counts join customer — never a row-explosion join of
    * customer × orders. The second aggregate runs at distinct-count
    * cardinality (≤ a few hundred rows at any SF). Counts only, so
    * every value is cross-engine exact.
    */
  def q33CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q34 TPC-H Q22 shape (positive-balance outliers with no urgent
    * orders): customers whose balance beats the global positive-balance
    * average AND who never placed a '1-URGENT' order, tallied per
    * nation. Two decorrelation patterns in one plan: the global scalar
    * subquery becomes a 1-row aggregate broadcast (`crossJoin(
    * broadcast(...))` — no shuffle, no driver round trip), and the NOT
    * EXISTS becomes a left anti join against the filtered orders
    * projection. The average compare is multiplied out (`bal·n >
    * Σbal`) so it stays in exact DECIMAL arithmetic — a divided
    * average would hash-mismatch on IEEE rounding.
    */
  def q34AcctbalOutliers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
    val glob = cust.filter(col("bal") > 0)
      .agg(sum(col("bal")).as("pos_sum"), count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(glob))
      .filter(col("bal") * col("n_pos") > col("pos_sum"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy(col("nationkey"))
  }

  /** Q35 TPC-H Q15 shape (top supplier by quarter revenue): the
    * argmax-of-an-aggregate. SQL spells it `revenue = (SELECT max(...)
    * FROM revenue_view)`; the scale shape is: ONE fact scan builds the
    * supplier-grain revenue aggregate, its global max is a 1-row
    * broadcast joined back to the aggregate (supplier cardinality, not
    * fact), and ties all survive (the = keeps every max-revenue
    * supplier, matching the view semantics). Revenue sums in
    * DECIMAL(18,4) — the q30 money convention — so the max equality is
    * exact cross-engine.
    */
  def q35TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("total_rev"))
    rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("max_rev"))))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name").as("name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("suppkey"))
  }

  /** Q36 TPC-H Q17 shape (small-quantity revenue): lineitems of one
    * brand whose quantity is below 20 % of that part's average
    * quantity. The correlated `l_quantity < 0.2 * (SELECT avg(...)
    * WHERE l_partkey = ...)` decorrelates to a part-grain aggregate
    * (sum + count from ONE lineitem scan) joined back to the detail
    * rows; the brand filter broadcasts into the detail side so only
    * that brand's lines reach the join. The 0.2·avg compare is
    * multiplied out (`5·qty·n < Σqty`, all positive) — exact integer/
    * DECIMAL arithmetic, no division anywhere.
    */
  def q36SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_sum"),
        count(lit(1)).as("qty_n"))
    li.join(broadcast(Tables.part(spark, dir)
        .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, Seq("l_partkey"))
      .filter(col("l_quantity").cast(DecimalType(18, 2)) * lit(5) * col("qty_n")
        < col("qty_sum"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .cast("double").as("total_rev"),
        count(lit(1)).as("n_lines"))
  }

  /** Q37 TPC-H Q7 shape (bilateral nation volume): revenue shipped
    * between a nation pair in either direction, by year. The nation
    * filter is pushed INTO both dimension chains before the fact join
    * (only the two nations' suppliers/customers survive — ~8 % of each
    * dim here, the selectivity the textbook plan wastes), so the
    * lineitem⋈orders fact-fact join is the only real shuffle and both
    * dim joins broadcast. The OR'd pair condition runs on two tiny
    * pre-joined columns, not on the raw dims. Year is extracted as
    * BIGINT on both engines.
    */
  def q37NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val natPair = Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_18", "NATION_19"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(natPair), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(natPair), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(discPrice).cast("double").as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q38 TPC-H Q8 shape (market share): one nation's share of a
    * region's import volume by year, as the two conditional DECIMAL
    * sums (numerator + denominator — the ratio is one division away;
    * emitting both keeps every gated value exact, the q34 multiplied-
    * out philosophy). All four dimension chains (region→nation→
    * customer, nation→supplier, filtered part) collapse to broadcasts
    * BEFORE the fact join; the conditional split is a `when` inside
    * ONE aggregation — never two scans of the joined fact.
    */
  def q38MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val vol = discPrice
    val afrKeys = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "AFRICA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val custAfr = Tables.customer(spark, dir)
      .join(broadcast(afrKeys), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNat = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(custAfr), col("o_custkey") === col("c_custkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_size") > 25).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast(DecimalType(24, 4))))
          .cast("double").as("nation_volume"),
        sum(vol).cast("double").as("total_volume"))
      .orderBy(col("l_year"))
  }

  /** Q39 TPC-H Q16 shape (supplier-count distribution): how many parts
    * have exactly N distinct qualifying suppliers, by brand —
    * excluding flagged suppliers (negative balance, the comment-filter
    * analog) via NOT IN. The scale shape: the exclusion is a broadcast
    * anti join on the tiny flagged set; the fact table collapses to
    * DISTINCT (part, supplier) grain in one shuffle; the distinct-
    * supplier count then runs at that grain, and the final histogram
    * at (brand, count) cardinality.
    */
  def q39SupplierDist(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .distinct()
    ps.join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .groupBy(col("p_brand"), col("supplier_cnt"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"), col("supplier_cnt"))
  }

  /** Q40 TPC-H Q19 shape (disjunctive predicates): revenue under an OR
    * of three (brand, size-band, quantity-band) conjunctions. The
    * part-only factor of the disjunction — `(brand1 ∧ size ≤ 15) ∨
    * (brand2 ∧ size ≤ 25) ∨ (brand3 ∧ size ≤ 35)` — is applied to the
    * part side BEFORE the join (the CNF-factored pushdown SQL engines
    * derive; stated explicitly here so the filtered part set
    * broadcasts), and the full mixed predicate runs as the join
    * output's filter. One fact scan, one broadcast join, one
    * aggregate.
    */
  def q40DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    def arm(brand: String, maxSize: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, maxSize) &&
        col("l_quantity").between(qLo, qHi)
    val partArm = (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(partArm)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#1", 15, 1, 20) || arm("Brand#2", 25, 10, 30) ||
        arm("Brand#3", 35, 20, 40))
      .agg(sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q41 TPC-H Q4 shape (order-priority checking): orders placed in one
    * quarter that had at least one line shipped more than 60 days after
    * the order date, counted by priority. The correlated EXISTS — its
    * predicate compares a lineitem column against the OUTER row's
    * o_orderdate — decorrelates to a LEFT SEMI join whose equi key
    * (orderkey) carries the shuffle and whose date comparison rides
    * along as the join residual; no per-row subquery survives. The
    * quarter window is pushed to the orders scan, so only ~4 % of
    * orders reach the semi join's build side at any SF.
    */
  def q41OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q42 TPC-H Q5 shape (local-supplier volume): revenue from orders
    * where the customer and the line's supplier sit in the SAME nation
    * of one region, by nation. The signature constraint —
    * `c_nationkey = s_nationkey` — cannot be pushed into either
    * dimension alone; it runs as a post-join filter on two pre-joined
    * tiny columns. Scale shape: the region filter collapses
    * nation→customer and nation→supplier to broadcasts BEFORE the fact
    * join (only the region's rows survive), the orders date window is
    * pushed to its scan, and lineitem⋈orders is the only real shuffle.
    */
  def q42LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNat = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(asiaNat.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(asiaNat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Q43 TPC-H Q10 shape (returned-item ranking): the top 20 customers
    * by revenue they generated on RETURNED lines in one quarter. The
    * aggregate runs at customer grain off ONE fact-fact join
    * (returnflag pushed to the lineitem scan, quarter window to the
    * orders scan); the name/nation dims join AFTER the aggregate, at
    * customer-grain cardinality, never against raw fact rows. Revenue
    * stays DECIMAL through the ORDER BY so the top-20 cutoff is exact
    * cross-engine (a double sort could flip near-ties), with custkey as
    * the deterministic tie-break; the global sort is a TakeOrdered
    * (top-k per partition then k-merge), not a full exchange.
    */
  def q43ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), discPrice.as("vol"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("vol")).as("rev"))
    perCust
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        col("rev").cast("double").as("revenue"), col("n_name"))
  }

  /** Q44 TPC-H Q12 shape (shipping-mode priority split, adapted to this
    * schema's columns): lines shipped more than 90 days after their
    * order date in one year, split into urgent vs non-urgent order
    * counts per line status. The two tallies are `sum(CASE)` arms
    * inside ONE aggregation over ONE join — never two passes over the
    * fact. The year window pushes to the lineitem scan; the lateness
    * predicate (comparing columns of both tables) is the join's
    * residual filter. Counts are BIGINT on both engines.
    */
  def q44LateShipments(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("high_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT", 1L).otherwise(0L))
          .as("low_count"))
      .orderBy(col("l_linestatus"))
  }

  /** Q45 TPC-H Q14 shape (promotion share): promo-part revenue vs total
    * revenue per ship month of one year, emitted as the two conditional
    * DECIMAL sums (the q38 numerator+denominator convention — the
    * percentage is one division away and keeping both sums exact is
    * what lets the hash gate hold). One fact scan with the year window
    * pushed down, the 2-column part side broadcasts, and the
    * promo/total split is a `when` inside ONE aggregation.
    */
  def q45PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val vol = discPrice
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).cast("long").as("l_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast(DecimalType(24, 4))))
          .cast("double").as("promo_revenue"),
        sum(vol).cast("double").as("total_revenue"))
      .orderBy(col("l_month"))
  }

  /** Q46 TPC-H Q9 shape (product-type profit, adapted: this schema has
    * no partsupp, so supply cost is modeled as half the part's retail
    * price — the reference cost column with the same join topology):
    * profit per supplier nation per year over one part type. Both money
    * terms are cast to DECIMAL(18,4) PER ROW before the subtraction so
    * the sum of differences is exact on both engines. The part filter
    * (p_type) is pushed to its scan and the 2-column survivors
    * broadcast; supplier and nation broadcast; lineitem is scanned
    * once and never shuffles before the final nation×year aggregate.
    */
  def q46ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    // cost = retail(18,2)·0.5(2,1)·qty(6,2) — DECIMAL(28,5), exact;
    // profit = discPrice(24,4) − cost → scale-5, still exact per row.
    val profit = discPrice -
      asMoney(col("p_retailprice")) * lit(BigDecimal("0.5")).cast(DecimalType(2, 1)) *
        col("l_quantity").cast(DecimalType(6, 2))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(profit).cast("double").as("profit"))
      .orderBy(col("n_name"), col("l_year"))
  }

  /** Q47 TPC-H Q6 shape (forecast revenue change): the pure
    * scan-predicate aggregate — a year window, a discount band and a
    * quantity cap, no join anywhere. All three predicates push to the
    * parquet scan, so at 100 TB this is row-group pruning + a
    * map-side-combined 1-row aggregate; the discount band compares the
    * stored double against the same double literals on both engines
    * (no arithmetic on the bounds, so no representation drift).
    */
  def q47SimpleRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(sum(asMoney(col("l_extendedprice")) * col("l_discount").cast(Pct))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q48 TPC-H Q20 shape (excess-share suppliers, adapted: no partsupp
    * availability in this schema, so the excess test is against the
    * part's own shipped volume): suppliers who shipped more than 30 %
    * of a PROMO part's total 1997 volume. The real Q20's nested
    * IN-chain (supplier IN (... partsupp WHERE availqty > 0.5·SUM(
    * lineitem ...))) decorrelates the same way: ONE fact scan
    * aggregates to (part, supplier) grain, the per-part total is a
    * window over that AGGREGATE grain (never a second fact scan or a
    * self-join), the share test is multiplied out in exact DECIMAL
    * (`10·qty_ps > 3·qty_p` — no division), and only the distinct
    * qualifying suppliers (supplier cardinality) reach the name join.
    */
  def q48ExcessShareSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val perPartSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("ps_qty"))
    perPartSupp
      .withColumn("p_qty",
        sum(col("ps_qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("ps_qty") * 10 > col("p_qty") * 3)
      .select(col("l_suppkey")).distinct()
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** The FULL TPC-H Q1 pricing summary (q02 is its reduced early-round
    * twin): shipdate cutoff, both discounted-money rollups, and the
    * line count, grouped on (returnflag, linestatus). The three Q1
    * averages are each ONE division away from the emitted sums/count —
    * emitted as sums because cross-engine average rounding is the one
    * part of Q1 that does NOT hash-gate (the multiplied-out convention).
    * Money multiplies IN the decimal domain (see the object-level
    * convention note): factors are tie-free raw-column casts, products
    * exact, and the one rounding anywhere is the GROUP-level HALF_UP
    * rescale of sum_charge from scale 6 to 4 — replayed in DuckDB as
    * round(sum, 4). The cutoff predicate is a plain comparison so it
    * pushes to the scan.
    */
  def q49PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        // three factors → exact DECIMAL(30,6) per row; the ONE rounding
        // is the group-level HALF_UP rescale to scale 4 (≡ DuckDB
        // round(sum, 4)), which also keeps the unscaled value < 2^53 so
        // the decimal→double cast is the same correctly-rounded value on
        // both engines.
        sum(discPrice * onePlusPct(col("l_tax")))
          .cast(DecimalType(38, 4)).cast("double").as("sum_charge"),
        sum(col("l_discount").cast(DecimalType(18, 4)))
          .cast("double").as("sum_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q28a oracle: DuckDB replay of the KMV profile — per column, the k
    * smallest 60-bit md5 hashes of the SERIALIZED value (byte-identical
    * to [[graft.ops.Profiler]]'s ser), estimate (k−1)·2^60 // h_k (the
    * d26 HUGEINT convention), exact rows/nulls/min/max from the same
    * q28 w-CTE.
    */
  private val q28aOracleSql: String = {
    val k = 1024
    val kM1M = ((BigInt(1) << 60) * (k - 1)).toString
    // (name, hash input, min/max serialization) — ser conventions of q28
    val cols = Seq(
      ("o_orderkey", "CAST(o_orderkey AS VARCHAR)",
        (a: String) => s"CAST($a AS VARCHAR)"),
      ("o_custkey", "CAST(o_custkey AS VARCHAR)",
        (a: String) => s"CAST($a AS VARCHAR)"),
      ("o_orderstatus", "o_orderstatus", (a: String) => a),
      ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)",
        (a: String) => s"CAST(CAST($a AS DECIMAL(18,2)) AS VARCHAR)"),
      ("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
        (a: String) => s"strftime($a, '%Y-%m-%d %H:%M:%S')"),
      ("o_orderpriority", "o_orderpriority", (a: String) => a))
    val wCols = cols.zipWithIndex.map { case ((n, _, mm), i0) =>
      val i = i0 + 1
      s"count($n) AS nn$i, ${mm(s"min($n)")} AS mn$i, ${mm(s"max($n)")} AS mx$i"
    }.mkString(",\n    ")
    val kmvCtes = cols.zipWithIndex.map { case ((n, h, _), i0) =>
      val i = i0 + 1
      s"""h$i AS (SELECT DISTINCT ('0x' || substr(md5($h), 1, 15))::BIGINT AS h
         |  FROM orders WHERE $n IS NOT NULL ORDER BY h LIMIT $k),
         |e$i AS (SELECT CASE WHEN count(*) < $k THEN count(*)
         |  ELSE (('$kM1M'::HUGEINT // max(h)::HUGEINT))::BIGINT END AS nd FROM h$i)"""
        .stripMargin
    }.mkString(",\n")
    val selects = cols.zipWithIndex.map { case ((n, _, _), i0) =>
      val i = i0 + 1
      val head = if (i == 1) s"SELECT '$n' AS \"column\", n AS n_rows, n - nn$i AS n_nulls, " +
        s"(SELECT nd FROM e$i) AS n_distinct, mn$i AS min_val, mx$i AS max_val FROM w"
      else s"UNION ALL SELECT '$n', n, n - nn$i, (SELECT nd FROM e$i), mn$i, mx$i FROM w"
      s"  $head"
    }.mkString("\n")
    s"""WITH w AS (
       |  SELECT count(*) AS n,
       |    $wCols
       |  FROM orders
       |),
       |$kmvCtes
       |SELECT * FROM (
       |$selects
       |) ORDER BY "column"""".stripMargin
  }

  /** Oracle SQL (DuckDB dialect ≡ ANSI) — must alias identically to the above. */
  val oracles: Map[String, String] = Map(
    "q28a_profile_approx" -> q28aOracleSql,
    // TPC-H Q1 shape; sums in per-row DECIMAL, averages one division away
    "q49_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q12_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q13_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
        |         OR lag(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS cnt
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_orderkey, l_extendedprice""".stripMargin,
    "q02_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name, count(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_star_join" ->
      """SELECT r_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q05_anti_join" ->
      """SELECT count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q06_distinct" ->
      "SELECT count(DISTINCT o_custkey) AS cnt FROM orders",
    "q07_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q08_window" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q09_events" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q14_percentiles" ->
      """SELECT l_returnflag,
        |  floor((quantile_cont(l_quantity, 0.5)) * 1000000 + 0.5) / 1000000 AS p50_qty,
        |  floor((quantile_cont(l_quantity, 0.9)) * 1000000 + 0.5) / 1000000 AS p90_qty,
        |  floor((quantile_cont(l_extendedprice, 0.95)) * 1000000 + 0.5) / 1000000 AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_exists" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q16_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q17_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |        / count(*) OVER w) * 1000000 + 0.5) / 1000000 AS avg_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |             RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q18_range_join" ->
      """SELECT period, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES ('1996-H2', TIMESTAMP '1996-07-01', TIMESTAMP '1997-01-01'),
        |             ('1997-H1', TIMESTAMP '1997-01-01', TIMESTAMP '1997-07-01'),
        |             ('1997-H2', TIMESTAMP '1997-07-01', TIMESTAMP '1998-01-01'),
        |             ('1998-H1', TIMESTAMP '1998-01-01', TIMESTAMP '1998-07-01'))
        |  p(period, start_d, end_d)
        |ON o_orderdate >= start_d AND o_orderdate < end_d
        |GROUP BY period ORDER BY period""".stripMargin,
    "q19_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // session_window semantics: an event MERGES while it starts at or
    // before the current session's end (= last event + gap), i.e. a new
    // session only at diff > gap — the same islands q13 computes. Spark's
    // UpdatingSessionsIterator splits strictly on start > currentEnd, so
    // two events exactly `gap` apart share a session (pinned in
    // RelationalSpec's exact-gap test).
    "q20_session_windows" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events
        |), flagged AS (
        |  SELECT user_id, us, value,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), sess AS (
        |  SELECT user_id, us, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(us) AS sess_start_us, max(us) + 1800000000 AS sess_end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin,
    "q21_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q22_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q25_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ts,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rev_30d,
        |  count(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q24_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin,
    "q23_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // The melt itself is engine-side (Expand); the oracle spells it as a
    // measure-list cross join over the SAME one-pass aggregate CTE.
    "q26_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, m.measure,
        |  CASE m.measure WHEN 'qty' THEN qty WHEN 'price' THEN price
        |       ELSE disc END AS value
        |FROM wide CROSS JOIN (VALUES ('qty'), ('price'), ('disc')) AS m(measure)
        |ORDER BY l_returnflag, measure""".stripMargin,
    // per-column stats recomputed independently and unioned into the
    // same long shape; doubles via DECIMAL(18,2), timestamps via
    // strftime — the Profiler's cross-engine serialization contract
    "q28_column_profile" ->
      """WITH w AS (
        |  SELECT count(*) AS n,
        |    count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
        |      CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        |    count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
        |      CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
        |    count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3,
        |      min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
        |    count(o_totalprice) AS nn4, count(DISTINCT o_totalprice) AS nd4,
        |      CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn4,
        |      CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx4,
        |    count(o_orderdate) AS nn5, count(DISTINCT o_orderdate) AS nd5,
        |      strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5,
        |      strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5,
        |    count(o_orderpriority) AS nn6, count(DISTINCT o_orderpriority) AS nd6,
        |      min(o_orderpriority) AS mn6, max(o_orderpriority) AS mx6
        |  FROM orders
        |)
        |SELECT * FROM (
        |  SELECT 'o_orderkey' AS "column", n AS n_rows, n - nn1 AS n_nulls,
        |         nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM w
        |  UNION ALL SELECT 'o_custkey', n, n - nn2, nd2, mn2, mx2 FROM w
        |  UNION ALL SELECT 'o_orderstatus', n, n - nn3, nd3, mn3, mx3 FROM w
        |  UNION ALL SELECT 'o_totalprice', n, n - nn4, nd4, mn4, mx4 FROM w
        |  UNION ALL SELECT 'o_orderdate', n, n - nn5, nd5, mn5, mx5 FROM w
        |  UNION ALL SELECT 'o_orderpriority', n, n - nn6, nd6, mn6, mx6 FROM w
        |) ORDER BY "column"""".stripMargin,
    // the bucketed layout must be result-invisible: plain join oracle
    "q27_bucket_join" ->
      """SELECT c_mktsegment AS mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY mktsegment ORDER BY mktsegment""".stripMargin,
    // the correlated form of the same predicate — DuckDB decorrelates
    // it; the Spark side declares the decorrelated plan directly, and
    // the avg comparison stays in exact decimal via cross-multiply
    "q29_correlated" ->
      """WITH ct AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS cust_total
        |  FROM orders GROUP BY o_custkey
        |), j AS (
        |  SELECT c_custkey, c_nationkey, cust_total
        |  FROM ct JOIN customer ON c_custkey = o_custkey
        |)
        |SELECT c_custkey, CAST(cust_total AS DOUBLE) AS cust_total FROM j
        |WHERE cust_total * (SELECT count(*) FROM j j2 WHERE j2.c_nationkey = j.c_nationkey)
        |      > 2 * (SELECT sum(cust_total) FROM j j3 WHERE j3.c_nationkey = j.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    // TPC-H Q3 shape; epoch-day long for the date, decimal revenue cast
    // to double at the end, deterministic limit-boundary tie-break
    "q30_shipping_priority" ->
      """SELECT l_orderkey,
        |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS o_day,
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_day
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    // TPC-H Q18 shape; the HAVING boundary compares exact decimals
    "q31_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
        |)
        |SELECT c_custkey, o_orderkey,
        |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS o_day,
        |  o_totalprice, CAST(qty AS DOUBLE) AS sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    // TPC-H Q21 shape, written here in its correlated-free form too so
    // the oracle mirrors the per-order arithmetic (DuckDB runs the same
    // decorrelated plan either way; the grouped form keeps the SQL an
    // exact spec of the Spark plan)
    "q32_sole_failing" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
        |  FROM lineitem GROUP BY l_orderkey, l_suppkey
        |), o AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(has_r) AS n_ret
        |  FROM ps GROUP BY l_orderkey
        |)
        |SELECT l_suppkey AS suppkey, count(*) AS numwait
        |FROM ps JOIN o USING (l_orderkey)
        |WHERE has_r = 1 AND n_supp >= 2 AND n_ret = 1
        |GROUP BY l_suppkey
        |ORDER BY numwait DESC, suppkey LIMIT 25""".stripMargin,
    // TPC-H Q13 shape; the LEFT JOIN preserves zero-order customers
    "q33_cust_distribution" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
        |)
        |SELECT coalesce(n, 0) AS c_count, count(*) AS custdist
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // TPC-H Q22 shape; avg compare multiplied out to exact decimals
    "q34_acctbal_outliers" ->
      """WITH cb AS (
        |  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer
        |), g AS (
        |  SELECT sum(bal) AS pos_sum, count(*) AS n_pos FROM cb WHERE bal > 0
        |)
        |SELECT c_nationkey AS nationkey, count(*) AS numcust,
        |  CAST(sum(bal) AS DOUBLE) AS totacctbal
        |FROM cb, g
        |WHERE bal * n_pos > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q15 shape; decimal equality keeps every max-revenue tie
    "q35_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey
        |), m AS (SELECT max(total_rev) AS max_rev FROM rev)
        |SELECT s_suppkey AS suppkey, s_name AS name,
        |  CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev, m JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = max_rev ORDER BY suppkey""".stripMargin,
    // TPC-H Q17 shape; 0.2*avg multiplied out (5*qty*n < sum)
    "q36_small_qty_revenue" ->
      """WITH pp AS (
        |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
        |    count(*) AS qty_n
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN pp USING (l_partkey)
        |WHERE p_brand = 'Brand#1'
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qty_n < qty_sum""".stripMargin,
    // TPC-H Q8 shape; numerator + denominator emitted (ratio = one
    // division away), conditional split inside ONE aggregation
    "q38_market_share" ->
      """SELECT l_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
        |               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(vol) AS DOUBLE) AS total_volume
        |FROM (
        |  SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |    ns.n_name AS supp_nation,
        |    (CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS vol
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region r ON nc.n_regionkey = r.r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE r.r_name = 'AFRICA' AND p_size > 25
        |)
        |GROUP BY l_year ORDER BY l_year""".stripMargin,
    // TPC-H Q16 shape; flagged-supplier NOT IN + distinct-count histogram
    "q39_supplier_dist" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |), cnt AS (
        |  SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |  FROM ps JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_size
        |)
        |SELECT p_brand, supplier_cnt, count(*) AS n_parts
        |FROM cnt GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // TPC-H Q19 shape; the OR of three mixed conjunctions in one WHERE
    "q40_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    // TPC-H Q7 shape; OR'd bilateral nation pair, year as BIGINT
    "q37_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year, CAST(sum(vol) AS DOUBLE) AS volume
        |FROM (
        |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |    (CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS vol
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  WHERE (ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
        |     OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18')
        |)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // TPC-H Q4 shape; EXISTS with a correlated date comparison
    "q41_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q5 shape; same-nation customer/supplier constraint
    "q42_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q10 shape; top-20 cutoff on exact DECIMAL revenue
    "q43_returned_items" ->
      """SELECT c_custkey, c_name, CAST(rev AS DOUBLE) AS revenue, n_name
        |FROM (SELECT o_custkey,
        |        sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS rev
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE l_returnflag = 'R'
        |        AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
        |      GROUP BY 1)
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,
    // TPC-H Q12 shape; dual conditional counts in one aggregation
    "q44_late_shipments" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q14 shape; promo/total conditional DECIMAL sums by month
    "q45_promo_share" ->
      """SELECT CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS l_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN (CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q9 shape; per-row DECIMAL casts BEFORE the subtraction
    "q46_product_profit" ->
      """SELECT n_name, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |         - (CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(2,1)) * CAST(l_quantity AS DECIMAL(6,2)))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'ECONOMY'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // TPC-H Q6 shape; pure scan-predicate aggregate, no join
    "q47_simple_revenue" ->
      """SELECT
        |  CAST(sum((CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
    // TPC-H Q20 shape; share test multiplied out in exact DECIMAL
    "q48_excess_share_suppliers" ->
      """WITH pp AS (
        |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  GROUP BY 1, 2
        |), pt AS (
        |  SELECT l_partkey, sum(ps_qty) AS p_qty FROM pp GROUP BY 1
        |)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM pp JOIN pt USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE ps_qty * 10 > p_qty * 3
        |ORDER BY s_suppkey""".stripMargin,
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter" -> q01ScanFilter _,
    "q02_agg_group"   -> q02AggGroup _,
    "q03_join_agg"    -> q03JoinAgg _,
    "q04_star_join"   -> q04StarJoin _,
    "q05_anti_join"   -> q05AntiJoin _,
    "q06_distinct"    -> q06Distinct _,
    "q07_topk"        -> q07TopK _,
    "q08_window"      -> q08Window _,
    "q09_events"      -> q09Events _,
    "q10_intersect"   -> q10Intersect _,
    "q11_rollup"      -> q11Rollup _,
    "q12_running"     -> q12Running _,
    "q13_sessions"    -> q13Sessions _,
    "q14_percentiles" -> q14Percentiles _,
    "q15_exists"      -> q15Exists _,
    "q16_pivot"       -> q16Pivot _,
    "q17_moving_avg"  -> q17MovingAvg _,
    "q18_range_join"  -> q18RangeJoin _,
    "q19_salted_agg"  -> q19SaltedAgg _,
    "q20_session_windows" -> q20SessionWindows _,
    "q21_bloom_join"  -> q21BloomJoin _,
    "q22_cube"        -> q22Cube _,
    "q23_window_nav"  -> q23WindowNav _,
    "q24_grouping_sets" -> q24GroupingSets _,
    "q25_range_frame" -> q25RangeFrame _,
    "q26_unpivot"     -> q26Unpivot _,
    "q27_bucket_join" -> q27BucketJoin _,
    "q28_column_profile" -> q28ColumnProfile _,
    "q28a_profile_approx" -> q28aProfileApprox _,
    "q29_correlated" -> q29Correlated _,
    "q30_shipping_priority" -> q30ShippingPriority _,
    "q31_large_volume" -> q31LargeVolume _,
    "q32_sole_failing" -> q32SoleFailing _,
    "q33_cust_distribution" -> q33CustDistribution _,
    "q34_acctbal_outliers" -> q34AcctbalOutliers _,
    "q35_top_supplier" -> q35TopSupplier _,
    "q36_small_qty_revenue" -> q36SmallQtyRevenue _,
    "q37_nation_volume" -> q37NationVolume _,
    "q38_market_share" -> q38MarketShare _,
    "q39_supplier_dist" -> q39SupplierDist _,
    "q40_disjunctive_revenue" -> q40DisjunctiveRevenue _,
    "q41_order_priority" -> q41OrderPriority _,
    "q42_local_supplier_volume" -> q42LocalSupplierVolume _,
    "q43_returned_items" -> q43ReturnedItems _,
    "q44_late_shipments" -> q44LateShipments _,
    "q45_promo_share" -> q45PromoShare _,
    "q46_product_profit" -> q46ProductProfit _,
    "q47_simple_revenue" -> q47SimpleRevenue _,
    "q48_excess_share_suppliers" -> q48ExcessShareSuppliers _,
    "q49_pricing_summary" -> q49PricingSummary _,
  )
}
