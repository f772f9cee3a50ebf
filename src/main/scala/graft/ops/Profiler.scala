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
  * #columns rows. For quick-look profiling at 100 TB swap the exact
  * `countDistinct` for `approx_count_distinct` (HLL, no Expand): the
  * exact spelling is the default because it is oracle-checkable.
  *
  * min/max serialization is dtype-driven so the output schema stays
  * uniform (strings) and cross-engine stable: integers/strings print
  * canonically, doubles round through DECIMAL(18,2) (raw double
  * rendering differs across engines), timestamps format as
  * `yyyy-MM-dd HH:mm:ss`.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    def ser(c: Column, dt: DataType): Column = dt match {
      case DoubleType | FloatType => c.cast(DecimalType(18, 2)).cast("string")
      case TimestampType | TimestampNTZType | DateType =>
        date_format(c, "yyyy-MM-dd HH:mm:ss")
      case _ => c.cast("string")
    }
    val cols = df.schema.fields.toSeq
    val aggs = cols.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"nn_${f.name}"),
        countDistinct(col(f.name)).as(s"nd_${f.name}"),
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
