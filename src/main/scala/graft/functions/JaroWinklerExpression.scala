package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the character-transposition-tolerant
  * ranking companion to `levenshtein` (Spark has no built-in): Jaro =
  * mean of (m/|a|, m/|b|, (m-t)/m) over window-matched characters m
  * and half-transpositions t, with Winkler's common-prefix boost
  * (length ≤ 4, scale 0.1) applied above the 0.7 threshold.
  *
  * Semantics deliberately match DuckDB's `jaro_winkler_similarity`
  * EXACTLY — including the edge DuckDB resolves differently from some
  * textbook forms: either input empty → 0.0, even when both are empty
  * (no a==b shortcut) — so the d30 gate can hash-compare rounded
  * scores cross-engine (the d05 round-6 double convention). Matching
  * window and prefix walk operate on UTF-16 code units; the gated
  * fixture is ASCII, where every engine agrees on character identity.
  *
  * Codegen: one static call per row (the Morton/dot-product shape) —
  * no boxing, stays inside whole-stage codegen.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.compute(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerSim$$.MODULE$$.compute($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** See the class doc for the exact semantics contract. */
  def compute(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0 // DuckDB: empty → 0, even if both
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb, i + w + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxP = math.min(4, math.min(la, lb))
    while (l < maxP && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
