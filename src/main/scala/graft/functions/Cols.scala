package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared across the engine. All built on codegen'd
  * Catalyst built-ins — no Scala UDFs in hot paths.
  */
object Cols {

  /** Epoch-nanosecond LongType → TimestampType (µs precision).
    * Companion of `spark.sql.legacy.parquet.nanosAsLong` (see
    * [[graft.GraftSession]]): parquet TIMESTAMP(NANOS) columns arrive as
    * longs and downstream window/watermark ops need real timestamps.
    */
  def nanosToTs(c: Column): Column = {
    // integer `div`, not Column./ — double division loses 1µs ULPs on
    // epoch-nano longs (~1.7e18 > 2^53) and can shift events across
    // window boundaries. `div` truncates toward zero, so pre-1970
    // (negative) nanos would land 1µs late; subtracting the pmod
    // remainder first makes it a true floor for either sign.
    val floored = c - pmod(c, lit(1000L))
    timestamp_micros(call_function("div", floored, lit(1000L)))
  }

  /** First 8 md5 hex digits of `c` as an unsigned 32-bit value in a
    * LongType — the engine's cross-engine-reproducible uniform hash.
    * md5 (not xxhash64) because every SQL engine agrees on md5's hex
    * output, so a DuckDB oracle replays it exactly:
    * `('0x' || substr(md5(x), 1, 8))::BIGINT`. Used by the md5 SimHash
    * (d07) and priority sampling (q22); both oracles must stay in
    * lockstep with THIS definition — change it in one place or not at
    * all.
    */
  def md5Uint32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
}
