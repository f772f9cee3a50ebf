package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text metrics in ONE pass over the text.
  *
  * Semantically identical to the `graft.ext.TextOps` column formulation
  * (that chain is ~8 higher-order/regex expressions, several of which
  * re-tokenize the same text; this computes everything from a single
  * tokenization). Fields:
  *
  *   n_tokens, n_subwords, n_chars, n_punct, stop_hits (English
  *   stopword count over lowered tokens), fingerprint (polynomial
  *   rolling hash mod 1e9+7 of token xxhash64s), lang_pred (marker
  *   heuristic, tie-break = lexicographically largest language, 'en'
  *   when no marker hits — matching `greatest(struct(h, lang))`),
  *   lang_hits (the winning marker score, 0 when nothing matched —
  *   the t15 gate column).
  */
case class TextMetrics(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextMetrics.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_metrics expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // ShingleWalk's Spark-semantics trim/split, NOT Java's: the
    // column-primitive twin strips spaces only and keeps trailing empty
    // tokens, and the fused path must count identically
    val trimmed = ShingleWalk.sparkTrim(text)
    val toks = trimmed.split("[ \\t\\n\\f\\r]+", -1)
    val empty = trimmed.isEmpty

    val nTokens = if (empty) 0 else toks.length
    val nSubwords = if (empty) 0 else TextMetrics.SubwordPattern.split(trimmed, -1).length
    var nPunct = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') nPunct += 1
      i += 1
    }

    var stopHits = 0
    var fingerprint = 0L
    val langHits = new Array[Int](TextMetrics.Langs.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      val lower = tok.toLowerCase
      if (TextMetrics.Stopwords.contains(lower)) stopHits += 1
      var l = 0
      while (l < TextMetrics.Langs.length) {
        if (TextMetrics.MarkerSets(l).contains(lower)) langHits(l) += 1
        l += 1
      }
      val h = math.floorMod(
        XxHash64Function.hash(UTF8String.fromString(tok), StringType, 42L), TextMetrics.P)
      fingerprint = math.floorMod(fingerprint * 31L + h, TextMetrics.P)
      t += 1
    }
    // zh char-occurrence hits (markers rarely space-separated)
    var zhChars = 0
    for (m <- TextMetrics.ZhMarkers) {
      var idx = text.indexOf(m)
      while (idx >= 0) { zhChars += m.length; idx = text.indexOf(m, idx + 1) }
    }
    langHits(TextMetrics.ZhIndex) += zhChars

    var bestLang = "en"
    var bestScore = 0
    var l = 0
    while (l < TextMetrics.Langs.length) {
      val s = langHits(l)
      // ties broken by lexicographically LARGEST language code, matching
      // the greatest(struct(h, lang)) column formulation
      if (s > bestScore || (s == bestScore && s > 0 && TextMetrics.Langs(l) > bestLang)) {
        if (s > 0) { bestScore = s; bestLang = TextMetrics.Langs(l) }
      }
      l += 1
    }

    new GenericInternalRow(Array[Any](
      // code points, not UTF-16 units: the declarative twin's length()
      // counts characters, and a supplementary char (emoji) is 2 units
      nTokens, nSubwords, text.codePointCount(0, text.length), nPunct, stopHits, fingerprint,
      UTF8String.fromString(bestLang), bestScore.toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextMetrics {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("lang_hits", LongType, nullable = false)))

  val P = 1000000007L
  val SubwordPattern: Pattern =
    Pattern.compile("[ \\t\\n\\f\\r]+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^a-zA-Z0-9 \\t\\n\\f\\r])")
  val Stopwords: Set[String] =
    Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  // keep in sync with graft.ext.TextOps.LangMarkers
  val Langs: Array[String] = Array("en", "de", "fr", "es", "zh")
  val MarkerSets: Array[Set[String]] = Array(
    Set("the", "and", "of", "is", "with", "for"),
    Set("der", "die", "und", "ist", "nicht", "mit"),
    Set("le", "la", "les", "est", "et", "dans"),
    Set("el", "los", "es", "y", "con", "para"),
    Set("的", "是", "在", "了", "和", "我"))
  val ZhMarkers: Seq[String] = Seq("的", "是", "在", "了", "和", "我")
  val ZhIndex = 4
}
