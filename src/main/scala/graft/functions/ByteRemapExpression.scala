package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style byte-to-printable remap (the `bytes_to_unicode` table of
  * the original BPE tokenizer, openai/gpt-2 `encoder.py`): every UTF-8
  * BYTE of the input maps to one printable character —
  *
  *   - bytes 33–126, 161–172, 174–255 map to the codepoint equal to the
  *     byte (they are already printable Latin-1);
  *   - every other byte b maps to codepoint 256 + rank(b), rank taken
  *     in ascending byte order (0 → U+0100 … 173 → U+0143);
  *   - DEVIATION, documented: the whitespace bytes the graft tokenizers
  *     split on (TAB, LF, FF, CR, SPACE — `[ \t\n\f\r]`) pass through
  *     as a plain SPACE instead of their GPT-2 codepoints. GPT-2 folds
  *     the space into its regex pre-tokenizer; graft's pre-tokenizer is
  *     the whitespace split ([[graft.ext.TextOps.tokens]]), which runs
  *     AFTER this remap — passing separators through keeps word
  *     boundaries intact while every non-separator byte still lands in
  *     the printable alphabet.
  *
  * The point of the remap is byte-FALLBACK: downstream BPE machinery
  * ([[graft.ext.TextOps.bpeMerges]]/`bpeEncode`) sees only printable
  * chars, so no byte sequence — accented text, mojibake, control bytes,
  * binary junk in a crawl — can fail to wrap, collide with the U+001C/D
  * symbol sentinels, or change length under case folding. The map is a
  * bijection on non-separator bytes, so remapped tokenizations are
  * losslessly invertible.
  *
  * Codegen: one static call per row (the Jaro-Winkler shape), a single
  * 256-entry char LUT walk over the raw UTF-8 bytes — no decode pass,
  * no boxing, stays inside whole-stage codegen.
  */
case class ByteRemap(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_remap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ByteRemap.remap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteRemap$$.MODULE$$.remap($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteRemap {

  /** byte value → remapped char; see the class doc for the contract. */
  val Lut: Array[Char] = {
    val lut = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174)
      if (printable) lut(b) = b.toChar
      else { lut(b) = next.toChar; next += 1 }
      b += 1
    }
    // whitespace passthrough (deviation from GPT-2, see class doc) —
    // AFTER rank assignment, so every other byte keeps its GPT-2 slot
    Seq('\t', '\n', '\f', '\r', ' ').foreach(c => lut(c.toInt) = ' ')
    lut
  }

  def remap(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = Lut(bytes(i) & 0xFF)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}
