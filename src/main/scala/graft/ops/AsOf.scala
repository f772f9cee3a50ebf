package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: for each left row, attach the single nearest
  * right row at or before ([[joinBackward]]) / at or after
  * ([[joinForward]]) its timestamp within the same key group — the
  * as-of of pandas/DuckDB/kdb, both directions inclusive.
  *
  * Spark-first design: NOT a range join (an inequality-condition join
  * degenerates to a per-key cross product — O(nl·nr) rows per key before
  * filtering). Instead both sides are unioned, shuffled ONCE on the key,
  * sorted by time within each partition, and the right row is carried
  * forward as ONE struct with `last(_, ignoreNulls)` over a running
  * window — O((nl+nr) log) per key, a single exchange, no join blowup.
  * The struct keeps the match row-atomic: null payload fields of a newer
  * right row can't be backfilled from an older one. This is the plan a
  * custom physical operator would produce anyway, so composition wins
  * over a bespoke SparkPlan.
  *
  * Determinism: right rows tied on (key, ts) are further ordered by the
  * carried payload struct, so the SAME tied row wins on every run
  * (consequence: payload columns must be orderable types — no maps).
  * Left rows with no matching right row keep null payload columns (left
  * as-of join).
  */
object AsOf {

  /** Most recent right row with `rightTs` ≤ `leftTs` (inclusive;
    * DuckDB ASOF semantics).
    *
    * @param left      probe side; all its columns survive
    * @param right     quote side; only `payload` columns are attached
    * @param keys      equality keys present on both sides
    * @param leftTs    left event-time column (any orderable type)
    * @param rightTs   right event-time column (same type as leftTs)
    * @param payload   right columns to carry onto each left row
    * @param tolerance max allowed `leftTs - rightTs` (same unit as the
    *        ts columns, which must then support `-`); matches older than
    *        this are nulled out. None = unbounded lookback.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, tolerance, forward = false)

  /** Earliest right row with `rightTs` ≥ `leftTs` (inclusive) — the
    * lookahead counterpart; `tolerance` bounds `rightTs - leftTs`.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, tolerance, forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload ${payload.filter(leftCols.contains).mkString(",")} collides with left columns")
    require(!(leftCols ++ payload ++ keys).exists(_.startsWith("_asof_")),
      "column names starting with _asof_ are reserved by the as-of join")

    val r = right
      .select((keys ++ payload :+ rightTs).distinct.map(col): _*)
      .withColumn("_asof_t", col(rightTs))
      .withColumn("_asof_src", lit(0))
      .withColumn("_asof_row",
        struct(payload.map(col) :+ col(rightTs).as("_asof_rt"): _*))
      .select((keys.map(col) ++ Seq(col("_asof_t"), col("_asof_src"), col("_asof_row"))): _*)
    val l = left
      .withColumn("_asof_t", col(leftTs))
      .withColumn("_asof_src", lit(1))
      .withColumn("_asof_row", lit(null).cast(r.schema("_asof_row").dataType))

    // Backward: ascending time, carry the last right row seen so far.
    // Forward: descending time — "last seen" is then the nearest
    // following row. Right rows sort before left at equal ts (inclusive
    // bound); the struct itself is the deterministic tie key.
    val timeKey: Column = if (forward) col("_asof_t").desc else col("_asof_t").asc
    val carry = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeKey, col("_asof_src").asc, col("_asof_row").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_row", last(col("_asof_row"), ignoreNulls = true).over(carry))

    val matched = tolerance match {
      case None => carried
      case Some(tol) =>
        val age =
          if (forward) col("_asof_row._asof_rt") - col("_asof_t")
          else col("_asof_t") - col("_asof_row._asof_rt")
        val stale = col("_asof_row").isNull || (age > lit(tol))
        carried.withColumn("_asof_row",
          when(stale, lit(null).cast(r.schema("_asof_row").dataType))
            .otherwise(col("_asof_row")))
    }
    val out = payload.foldLeft(matched)((d, c) => d.withColumn(c, col(s"_asof_row.$c")))
    out.filter(col("_asof_src") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
