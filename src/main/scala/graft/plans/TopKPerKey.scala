package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key group.
  *
  * The declarative spelling — `row_number().over(Window.partitionBy(keys)
  * .orderBy(order)) <= k` — shuffles and sorts exactly like this operator
  * but then runs the full window-function machinery (frame evaluation,
  * rank projection, post-filter) over EVERY row. This node plans to
  * [[TopKPerKeyExec]], which declares the same clustered distribution +
  * (keys, order) child ordering — EnsureRequirements inserts the single
  * exchange and per-partition sort — and then simply streams the sorted
  * input, emitting the first k rows of each key group. No rank column is
  * materialized, no frame state exists, and a group's remaining rows are
  * skipped the moment its k-th row passes.
  *
  * Demonstrates the custom-plan preference chain end to end: logical
  * node → [[TopKPerKeyStrategy]] (injected via
  * `spark.experimental.extraStrategies` by [[graft.ops.TopK]]) →
  * physical operator.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical take-first-k-per-group over input that EnsureRequirements
  * has already clustered by `keys` and sorted by (keys, order).
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  // pass-through: input order and partitioning survive
  override def outputOrdering: Seq[SortOrder] = keys.map(SortOrder(_, Ascending)) ++ order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var currentKey: UnsafeRow = null
      var emitted = 0
      it.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy() // keyProj reuses its buffer
          emitted = 1
          true
        } else if (emitted < limit) {
          emitted += 1
          true
        } else false
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]]; a no-op for every other node. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Column pruning through [[TopKPerKeyNode]]: Catalyst's own
  * ColumnPruning rule only knows built-in nodes, so without this a
  * projection above the operator still shuffles EVERY child column
  * (vectors, document text, ...). When a parent Project consumes a
  * strict subset of the node's output, push a Project holding
  * (consumed ∪ key ∪ order) attributes beneath the node — the slimmed
  * child then prunes all the way to the scan through the normal rules.
  * Injected via `experimental.extraOptimizations` alongside the
  * strategy.
  */
object TopKPerKeyPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, t @ TopKPerKeyNode(keys, order, _, child)) =>
      val needed = AttributeSet(p.references) ++
        AttributeSet(keys.flatMap(_.references)) ++
        AttributeSet(order.flatMap(_.references))
      if (child.output.forall(needed.contains)) p
      else p.copy(child =
        t.copy(child = Project(child.output.filter(needed.contains), child)))
  }
}
