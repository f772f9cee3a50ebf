package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text's whitespace tokens, one pass per row.
  *
  * Equivalent to the declarative formulation (explode tokens →
  * xxhash64 → 64 conditional sums → bit reassembly) but with NO
  * explode and NO shuffle: the per-document counters live in a local
  * array. On 5 000 docs this replaces a |tokens|-row shuffle with a
  * scan; at 100 TB it removes the operator's only wide dependency —
  * near-dup banding then shuffles 8 bytes per doc.
  *
  * Bit b is set when Σ_tokens (bit b of xxhash64(token) ? +1 : −1) > 0,
  * identical to `graft.ext.Dedup.simhash64`'s column math (verified in
  * ExtSpec).
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    // ShingleWalk.tokens, NOT Java trim/split: must tokenize exactly
    // like the declarative twin's split(trim(text), "[ \\t\\n\\f\\r]+")
    val toks = ShingleWalk.tokens(input.asInstanceOf[UTF8String].toString)
    val sums = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks(t)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash with an md5-derived token hash, one pass per row —
  * the zero-exchange form of the oracle-gated d07 query. The token
  * hash is the first 8 md5 hex digits parsed as an unsigned 32-bit
  * integer — `conv(substring(md5(tok), 1, 8), 16, 10)`, i.e. the first
  * 4 digest bytes big-endian — so the DuckDB oracle
  * `('0x' || substr(md5(tok), 1, 8))::BIGINT` replays it bit-for-bit
  * (the same [[graft.functions.Cols.md5Uint32]] contract). Empty
  * tokens are skipped exactly like the declarative twin's
  * `filter(tok =!= "")`; a sign-sum tie yields bit 0 on every engine.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_md5 expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = ShingleWalk.tokens(input.asInstanceOf[UTF8String].toString)
    val md = Md5Local.get()
    val sums = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        // digest() resets the instance — safe to reuse per token/row
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (sums(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
