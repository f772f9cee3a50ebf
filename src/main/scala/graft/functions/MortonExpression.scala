package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst Morton (z-order) code.
  *
  * `children` = one foldable `array<array<double>>` literal carrying the
  * per-column quantile boundaries, followed by the value columns (as
  * doubles). The result interleaves each value's quantile rank — the
  * count of boundaries <= v, nulls ranking 0 — bit j of column i landing
  * at position `j * nCols + i`, identical to
  * [[graft.ops.ZOrder.interleave]] / [[graft.ops.ZOrder.rankOf]].
  *
  * Why an expression and not a UDF: this sits in the COMPACTION REWRITE
  * path — the operator that re-lays-out whole tables — so it runs once
  * per row of everything it touches. A Scala UDF there means per-row
  * boxing of an allocated Seq plus a codegen fence in the exact place
  * whole-stage fusion matters most; this generates a branch-free fused
  * loop (binary search + bit interleave) with no allocation.
  */
case class MortonCode(children: Seq[Expression]) extends Expression {

  require(children.size >= 2, "graft_morton needs bounds + at least one column")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  private def nCols: Int = children.size - 1

  override def checkInputDataTypes(): TypeCheckResult = {
    val boundsOk = children.head.foldable && (children.head.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (!boundsOk)
      TypeCheckResult.TypeCheckFailure(
        "graft_morton expects a foldable array<array<double>> bounds literal first, " +
          s"got ${children.head.dataType.catalogString}")
    else if (children.tail.exists(_.dataType != DoubleType))
      TypeCheckResult.TypeCheckFailure(
        "graft_morton value columns must be double, got " +
          children.tail.map(_.dataType.catalogString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bounds: Array[Array[Double]] = {
    val ad = children.head.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def eval(input: InternalRow): Any = {
    var acc = 0L
    var i = 0
    while (i < nCols) {
      val v = children(i + 1).eval(input)
      val rank =
        if (v == null) 0
        else graft.ops.ZOrder.rankOf(bounds(i), v.asInstanceOf[Double])
      var j = 0
      while (j < 32 && (rank >> j) != 0) {
        if (((rank >> j) & 1) == 1) acc |= 1L << (j * nCols + i)
        j += 1
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("mortonBounds", bounds, "double[][]")
    val rankFn = ctx.addNewFunction("graftMortonRank",
      s"""
         |private int graftMortonRank(double[] b, double v) {
         |  int lo = 0; int hi = b.length;
         |  while (lo < hi) {
         |    int mid = (lo + hi) >>> 1;
         |    if (b[mid] <= v) lo = mid + 1; else hi = mid;
         |  }
         |  return lo;
         |}
       """.stripMargin)
    val acc = ctx.freshName("acc")
    val perCol = children.tail.zipWithIndex.map { case (c, i) =>
      val e = c.genCode(ctx)
      val rk = ctx.freshName("rk")
      val j = ctx.freshName("j")
      s"""
         |${e.code}
         |int $rk = ${e.isNull} ? 0 : $rankFn($boundsRef[$i], ${e.value});
         |for (int $j = 0; $j < 32 && ($rk >> $j) != 0; $j++) {
         |  if ((($rk >> $j) & 1) == 1) $acc |= 1L << ($j * $nCols + $i);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long $acc = 0L;
        |$perCol
        |final long ${ev.value} = $acc;
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
