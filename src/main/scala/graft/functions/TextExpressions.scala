package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared tokenize-and-window walk for the shingle expressions,
  * replicating the DECLARATIVE twin `split(trim(text), "[ \\t\\n\\f\\r]+")` +
  * [[graft.ext.TextOps.shingles]] exactly — which is also what the
  * DuckDB oracles compute:
  *   - trim strips SPACES only (Spark/DuckDB `trim`), not all
  *     whitespace (Java `String.trim` strips every char ≤ U+0020 and
  *     would silently drop a trailing newline's empty token);
  *   - split keeps trailing empty tokens (Spark `split` uses limit -1;
  *     Java's default limit 0 drops them).
  * Divergence here breaks the bit-for-bit equality contract of every
  * expression built on it, so there is exactly one copy.
  */
/** Per-thread MD5 digest for the native md5 expressions: MessageDigest
  * is stateful and not thread-safe, but `digest()` leaves it reset, so
  * one instance per task thread serves every row — no per-row
  * getInstance (JCA provider lookup + allocation) on corpus-scale
  * scans.
  */
private[functions] object Md5Local {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def get(): java.security.MessageDigest = local.get()
}

private[functions] object ShingleWalk {

  /** Spark `trim`: strip SPACES (U+0020) only, both ends. */
  def sparkTrim(text: String): String = {
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    text.substring(b, e)
  }

  /** `split(trim(text), "[ \\t\\n\\f\\r]+")` with Spark semantics (limit -1 keeps
    * trailing empty tokens).
    */
  def tokens(text: String): Array[String] = sparkTrim(text).split("[ \\t\\n\\f\\r]+", -1)

  /** Apply `f` to each word n-gram (space-joined); a text with fewer
    * than n tokens yields its full token join once.
    */
  def foreachShingle(text: String, n: Int)(f: String => Unit): Unit = {
    val toks = tokens(text)
    val sb = new java.lang.StringBuilder()
    if (toks.length < n) {
      var i = 0
      while (i < toks.length) { if (i > 0) sb.append(' '); sb.append(toks(i)); i += 1 }
      f(sb.toString)
    } else {
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        f(sb.toString)
        i += 1
      }
    }
  }
}

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
    val out = new java.util.LinkedHashSet[Long]()
    ShingleWalk.foreachShingle(text, n)(s => out.add(hash(s)))
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

/** Minimum md5 hex digest over the word n-gram shingles of a text, in
  * one pass — the t04 document fingerprint without the
  * shingle-array→explode→shuffle→min-agg plan: per row it is a tight
  * loop (tokenize, digest each window, keep the lexicographic min), so
  * the fingerprint query becomes scan→project with NO exchange before
  * the final sort. md5 (not xxhash64) so a DuckDB oracle recomputes it
  * bit-for-bit: equals `min(md5(shingle))` over
  * [[graft.ext.TextOps.shingles]] (equality pinned in ExtSpec).
  */
case class MinShingleMd5(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = Md5Local.get()
    var min: String = null
    ShingleWalk.foreachShingle(text, n) { s =>
      // digest() resets the instance — safe to reuse per shingle/row
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = Character.forDigit((d(k) >> 4) & 0xf, 16)
        hex(2 * k + 1) = Character.forDigit(d(k) & 0xf, 16)
        k += 1
      }
      val h = new String(hex)
      if (min == null || h.compareTo(min) < 0) min = h
    }
    UTF8String.fromString(min)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC (canonical composition) normalization — the multilingual
  * text-cleanup primitive (decomposed accents, unordered combining
  * marks) Spark has no built-in for. Backed by the JDK's
  * `java.text.Normalizer` (Unicode-standard canonical composition, so
  * it agrees with DuckDB's utf8proc-backed `nfc_normalize` — the t18
  * gate pins that cross-engine equality on real combining sequences).
  * True codegen (no fallback): one static call per row inside
  * whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
