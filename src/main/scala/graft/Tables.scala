package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver corpus at /root/testdata/sf*.
  *
  * All graft queries take `(SparkSession, sfDir)` and resolve tables
  * through here, so the same code runs at any scale factor (and, on a
  * real cluster, against any object-store URI Hadoop can resolve).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  /** The events stream table with `ts` NORMALIZED to LongType epoch
    * nanoseconds, whatever the fixture's on-disk encoding:
    *
    *   - parquet TIMESTAMP(NANOS) + `nanosAsLong=true` (GraftSession)
    *     already surfaces as LongType — passed through;
    *   - parquet TIMESTAMP(MICROS) (the regenerated driver fixtures)
    *     surfaces as TIMESTAMP_NTZ/TIMESTAMP — converted via
    *     `unix_micros · 1000` (session timezone is pinned UTC, so the
    *     NTZ→instant reading is unambiguous).
    *
    * Every downstream operator and every DuckDB oracle (`epoch_ns(ts)`)
    * computes in epoch-nanos, so the engine keeps ONE ts convention
    * regardless of which writer produced the fixture. The cast is a
    * codegen'd map-side projection — no shuffle, pushdown on other
    * columns unaffected.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported type $other")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
