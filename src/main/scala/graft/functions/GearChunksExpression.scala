package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (gear/FastCDC-style rolling hash) — the
  * boundary finder behind shift-robust chunk-level dedup: an insertion
  * near the top of a document moves every byte offset, so fixed-size
  * blocks all change, but content-defined cut points re-align after
  * ~one hash window and the unchanged tail chunks hash identically
  * again. Returns the chunk spans `array<struct<start, len>>` (0-based
  * codepoint offsets) in ONE pass per row — narrow, no shuffle, the
  * codec-boundary cost model.
  *
  * The contract (deliberately SQL-replayable, the d33 gate):
  *
  *  - positions are 1-based Unicode code points;
  *  - gear(cp) = the first 4 hex chars of `md5(cp)` (cp printed base
  *    10) as an integer — 16 bits, derivable in any engine with md5;
  *  - h_i = (2·h_{i−1} + gear(cp_i)) mod 2^31. Because 2^k ≡ 0
  *    (mod 2^31) for k ≥ 31, this recurrence EQUALS the windowed sum
  *    `Σ_{j=i−30..i} gear(cp_j)·2^(i−j) mod 2^31` — the hash has an
  *    exact 31-codepoint memory, which is (a) why cut points re-align
  *    after an edit, and (b) why the oracle needs no recursion: a
  *    31-row windowed self-join replays every h_i, and 16-bit gears
  *    keep the un-modded sum < 2^51, overflow-free in BIGINT;
  *  - a cut falls after position i iff h_i mod 2^maskBits == 0; the
  *    end of the text is always a cut. Chunks are the spans between
  *    consecutive cuts (expected length ~2^maskBits codepoints).
  *
  * No per-row state survives the row; the gear table is a bounded
  * (≤ alphabet) per-instance cache. Codegen is one virtual call per
  * row on a plan-referenced machine (the BlocklistCounts shape).
  */
case class GearChunks(child: Expression, maskBits: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 30,
    s"maskBits must be in [1, 30], got $maskBits")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_gear_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")

  // gear(cp) caches per deserialized instance; ConcurrentHashMap +
  // per-call digest because one plan-referenced instance may serve
  // several of local[32]'s task threads
  @transient private lazy val gearCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Integer]()

  private def gear(cp: Int): Int =
    gearCache.computeIfAbsent(cp, { c: Integer =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(String.valueOf(c).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      // first 4 hex chars == first 2 bytes, big-endian
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    })

  /** One-pass chunking; called from both eval paths. */
  def chunks(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1 << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var lastCut = 0
    var i = 0
    while (i < n) {
      h = ((h << 1) + gear(cps(i))) & 0x7FFFFFFFL
      val atEnd = i == n - 1
      if ((h & mask) == 0L || atEnd) {
        out += InternalRow(lastCut, i + 1 - lastCut)
        lastCut = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gearChunks", this, classOf[GearChunks].getName)
    defineCodeGen(ctx, ev, c => s"$ref.chunks($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
