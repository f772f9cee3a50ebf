package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Bloom-filter semi-join reduction.
  *
  * The classic 100 TB join shape: a fact table joined to a filtered
  * dimension whose surviving key set is small, but not small enough (or
  * not provably small enough at plan time) for Catalyst to broadcast
  * the join itself. Shuffling the whole fact table to discover that
  * 98% of its rows have no match is the dominant cost; a Bloom filter
  * over the dimension keys — kilobytes per million keys at 1% fpp —
  * broadcast to every task prunes non-matching fact rows BEFORE the
  * exchange, so the shuffle carries only (matches + fpp·misses).
  *
  * False positives are harmless: surviving rows still go through the
  * real join, so results are bit-identical to the unfiltered join (the
  * q21 gate query pins this against the plain-SQL oracle). Spark's own
  * runtime bloom rewrite (spark.sql.optimizer.runtime.bloomFilter) has
  * the same idea but only fires on selective-filter heuristics; this
  * operator is the explicit form a pipeline author can apply when they
  * KNOW the key set is small (e.g. after an anti-join or a dedup).
  */
object Prefilter {

  /** Filter `fact` down to rows whose `factKey` might appear in
    * `dim`'s `dimKey` column, using a driver-built Bloom filter.
    *
    * One job over `dim` builds the filter (combined tree-style on the
    * driver by `DataFrameStatFunctions.bloomFilter`); the returned
    * DataFrame carries a broadcast reference, so downstream joins see a
    * pre-pruned fact side. Key types: integral or string (the types
    * Spark's sketch supports).
    *
    * @param expectedItems sizing hint; defaults to a count of `dim`
    *        (one cheap job — pass the known cardinality to skip it)
    * @param fpp false-positive probability; 1% costs ~1.2 bytes/key
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    // the filter is built from dim's values but probed with fact's: the
    // two sides must hash identically, so their key types must share a
    // sketch class (both integral or both string). A mismatch would not
    // fail — it would silently prune almost every true match, because
    // putLong bits never collide with mightContainString bits.
    def sketchClass(t: org.apache.spark.sql.types.DataType): String = t match {
      case LongType | IntegerType => "integral"
      case StringType             => "string"
      case other => throw new IllegalArgumentException(
        s"bloomSemiJoin supports integral or string keys, got $other")
    }
    val keyType = fact.schema(factKey).dataType
    require(sketchClass(keyType) == sketchClass(dim.schema(dimKey).dataType),
      s"bloomSemiJoin key types must share a sketch class: " +
        s"$factKey is $keyType, $dimKey is ${dim.schema(dimKey).dataType}")
    val n = if (expectedItems > 0) expectedItems else dim.select(dimKey).count()
    if (n == 0) return fact.filter(lit(false))
    val bf = dim.stat.bloomFilter(dimKey, n, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    // Deliberate UDF, with no public alternative on this Spark: the
    // codegen'd BloomFilterMightContain expression exists but sits in
    // org.apache.spark.sql.catalyst (private API, and it expects the
    // serialized sketch of AggregateBloomFilter — not the public
    // util.sketch.BloomFilter stat.bloomFilter returns), and Catalyst's
    // own runtime-filter rewrite only injects it below joins it planned
    // itself. The probe is one primitive call per row against a
    // broadcast sketch — the codegen fence costs far less than the scan
    // it prunes; revisit if BloomFilterMightContain ever goes public.
    val might = keyType match {
      case LongType | IntegerType =>
        udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
      case StringType =>
        udf((k: String) => k != null && bfB.value.mightContainString(k))
      case other =>
        throw new IllegalArgumentException(
          s"bloomSemiJoin supports integral or string keys, got $other for $factKey")
    }
    fact.filter(might(col(factKey).cast(if (keyType == IntegerType) LongType else keyType)))
  }
}
