package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** k seeded MinHash values of a hashed-shingle set, one pass, NO shuffle.
  *
  * Replaces the explode → groupBy(id).agg(min(xxhash64(lit(i), h)) × k)
  * formulation, whose exploded shingle stream (|docs| × |set| rows) was
  * the whole signature stage's shuffle. Values are IDENTICAL to that
  * formulation: element i equals min over the set of
  * `xxhash64(lit(i: Int), shingle)` — i.e. XxHash64 folded over an int
  * then a long with Spark's default seed 42 — so LSH banding built on
  * either signature produces the same buckets.
  *
  * Empty input sets return an empty array (callers filter them out;
  * a sentinel signature would make all empty docs near-dup each other).
  */
case class MinHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, s"minhash needs k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhashes expects array<bigint>, got ${other.catalogString}")
  }

  // per-seed prefix hash: XxHash64(seed=42) folded over the int literal i
  @transient private lazy val seedHashes: Array[Long] =
    Array.tabulate(k)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = XxHash64Function.hash(h, LongType, seedHashes(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
