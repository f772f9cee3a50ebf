package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiling: per column, the null count, exact
  * distinct count, and serialized min/max — the stats layer every
  * data-management pass needs (validate a promotion, sanity-check a
  * compaction rewrite, diff a delta-sync's two trees by content).
  *
  * Scale design: ONE scan of the table. All per-column aggregates run
  * in a single `agg` — Spark plans the N exact `count(DISTINCT)`s as
  * one Expand (factor N+1) over that single scan with partial
  * aggregation before the shuffle, where the naive per-column loop
  * would scan the table N times. The wide one-row result is then
  * exploded to one row per column — driver-free, output is
  * #columns rows. For quick-look profiling at 100 TB use
  * [[profileApprox]] (`approx_count_distinct` — HLL, no Expand, one
  * plain-aggregation scan): the exact spelling is the default because
  * it is oracle-checkable; the approx twin is spec-gated to ≤ 2%
  * distinct-count error on the fixtures and probed for scale shape by
  * the bench's `column_profile_approx` arm.
  *
  * min/max serialization is dtype-driven so the output schema stays
  * uniform (strings) and cross-engine stable: integers/strings print
  * canonically, doubles round through DECIMAL(18,2) (raw double
  * rendering differs across engines), timestamps format as
  * `yyyy-MM-dd HH:mm:ss`.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(c))

  /** [[profile]] with `approx_count_distinct` (HLL++, relative sd
    * `rsd`) in place of the exact distinct counts — the 100 TB
    * quick-look path: the plan is ONE scan with plain partial
    * aggregation and NO Expand at all (the exact plan's Expand
    * multiplies the scanned rows by N+1 aggregate streams — the
    * dominant cost of q28's measured profile). Same output schema;
    * `n_distinct` carries the estimate. rsd is a STANDARD DEVIATION,
    * not a bound — the default 0.01 (a ~10⁴-register, few-KB sketch
    * per column) leaves the fixture-pinned ≤ 2% per-column error in
    * SkewAndBucketSpec two sigmas of headroom.
    */
  def profileApprox(df: DataFrame, rsd: Double = 0.01): DataFrame =
    profileWith(df, c => approx_count_distinct(c, rsd))

  /** Cross-engine-stable string form of a value (see the object
    * scaladoc); also the hash INPUT for [[profileKmv]], where DuckDB
    * must md5 the identical bytes.
    */
  private def ser(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(18, 2)).cast("string")
    case TimestampType | TimestampNTZType | DateType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** [[profile]] with KMV distinct ESTIMATES (the k smallest 60-bit
    * md5 hashes of the serialized value — [[Approx.kmvSketch]]) in
    * place of the exact counts: the ORACLE-GATED approx twin. Unlike
    * [[profileApprox]]'s HLL++ (engine-internal registers — only
    * error-bandable), every estimate here is a pure integer function
    * of the input that DuckDB replays hash-exactly (the d26 KMV
    * convention), so the approx path itself sits under the driver's
    * rows+schema+hash gate.
    *
    * The 100 TB shape: one plain-agg scan for rows/nulls/min/max (no
    * Expand), plus per column a COLUMN-PRUNED scan → distinct of the
    * 8-byte hash (map-side partial) → TakeOrdered(k) per-partition
    * heaps. N single-column scans of a columnar format read ~the same
    * bytes as the exact plan's one all-column scan, and nothing
    * shuffles more than k·partitions hash rows. Estimates are distinct
    * counts of the SERIALIZED form — injective on real data (doubles
    * are money-2dp, timestamps second-grain) and identical cross-engine.
    */
  def profileKmv(df: DataFrame, k: Int = 1024): DataFrame = {
    val cols = df.schema.fields.toSeq
    val aggs = cols.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"nn_${f.name}"),
        ser(min(col(f.name)), f.dataType).as(s"mn_${f.name}"),
        ser(max(col(f.name)), f.dataType).as(s"mx_${f.name}"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"nn_${f.name}")).as("n_nulls"),
        col(s"mn_${f.name}").as("min_val"),
        col(s"mx_${f.name}").as("max_val"))
    }
    val base = wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
    val ests = cols.map { f =>
      Approx.kmvDistinct(
          Approx.kmvSketch(df.filter(col(f.name).isNotNull),
            ser(col(f.name), f.dataType), k), k)
        .select(lit(f.name).as("column"), col("distinct_est").as("n_distinct"))
    }.reduce(_ unionByName _)
    base.join(ests, Seq("column"))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  private def profileWith(df: DataFrame,
      distinctAgg: Column => Column): DataFrame = {
    val cols = df.schema.fields.toSeq
    val aggs = cols.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"nn_${f.name}"),
        distinctAgg(col(f.name)).as(s"nd_${f.name}"),
        ser(min(col(f.name)), f.dataType).as(s"mn_${f.name}"),
        ser(max(col(f.name)), f.dataType).as(s"mx_${f.name}"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"nn_${f.name}")).as("n_nulls"),
        col(s"nd_${f.name}").as("n_distinct"),
        col(s"mn_${f.name}").as("min_val"),
        col(s"mx_${f.name}").as("max_val"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
