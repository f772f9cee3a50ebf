package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: for each left row, attach the single most
  * recent right row with `rightTs` ≤ `leftTs` within the same key group
  * (the "backward" as-of of pandas/DuckDB/kdb).
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
  * At equal timestamps the right row sorts BEFORE the left row, so a
  * simultaneous right row matches (inclusive bound, DuckDB semantics).
  * Left rows with no prior right row keep null payload columns (left
  * as-of join).
  */
object AsOf {

  /** @param left      probe side; all its columns survive
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
      tolerance: Option[Long] = None): DataFrame = {
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

    // right rows sort first at equal ts → inclusive backward match
    val carry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t").asc, col("_asof_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_row", last(col("_asof_row"), ignoreNulls = true).over(carry))

    val matched = tolerance match {
      case None => carried
      case Some(tol) =>
        val stale = col("_asof_row").isNull ||
          (col("_asof_t") - col("_asof_row._asof_rt") > lit(tol))
        carried.withColumn("_asof_row",
          when(stale, lit(null).cast(r.schema("_asof_row").dataType))
            .otherwise(col("_asof_row")))
    }
    val out = payload.foldLeft(matched)((d, c) => d.withColumn(c, col(s"_asof_row.$c")))
    out.filter(col("_asof_src") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Forward as-of: attach the EARLIEST right row with `rightTs` ≥
    * `leftTs` per key (inclusive). Same single-shuffle union+window
    * machinery as [[joinBackward]], with time descending so "carry the
    * last seen right row" means "the nearest following one".
    *
    * @param tolerance max allowed `rightTs - leftTs`; farther matches
    *        are nulled out. None = unbounded lookahead.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
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

    // time DESC; right rows still first at equal ts → inclusive forward match
    val carry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t").desc, col("_asof_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_row", last(col("_asof_row"), ignoreNulls = true).over(carry))

    val matched = tolerance match {
      case None => carried
      case Some(tol) =>
        val stale = col("_asof_row").isNull ||
          (col("_asof_row._asof_rt") - col("_asof_t") > lit(tol))
        carried.withColumn("_asof_row",
          when(stale, lit(null).cast(r.schema("_asof_row").dataType))
            .otherwise(col("_asof_row")))
    }
    val out = payload.foldLeft(matched)((d, c) => d.withColumn(c, col(s"_asof_row.$c")))
    out.filter(col("_asof_src") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
