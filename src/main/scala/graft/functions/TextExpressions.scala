package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of the word n-gram (shingle) set of a text,
  * in one pass.
  *
  * Replaces the built-in chain `array_distinct(transform(shingles(...)))`
  * — five nested higher-order functions, each a per-element closure
  * dispatch plus intermediate array allocations. That chain dominated
  * the near-dedup operators' runtime (~4 s per pass over 5 000 docs;
  * this is one virtual call per row). `CodegenFallback` is fine here:
  * the win is loop fusion, not codegen — the per-row work is a single
  * tight Scala loop.
  *
  * Hash values equal `xxhash64(concat_ws(" ", slice(tokens, i, n)))` for
  * each window (documents shorter than n words hash their full token
  * join), so results are interchangeable with the built-in formulation.
  */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.trim.split("\\s+")
    val out = new java.util.LinkedHashSet[Long]()
    val sb = new java.lang.StringBuilder()
    if (toks.length < n) {
      sb.setLength(0)
      var i = 0
      while (i < toks.length) { if (i > 0) sb.append(' '); sb.append(toks(i)); i += 1 }
      out.add(hash(sb.toString))
    } else {
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out.add(hash(sb.toString))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    ArrayData.toArrayData(arr)
  }

  private def hash(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
