package graft.ops

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

import graft.plans.{TopKPerKeyNode, TopKPerKeyPruning, TopKPerKeyStrategy}

/** Column-level API over the [[graft.plans.TopKPerKeyNode]] custom
  * operator: the top `k` rows of each key group under `order`, without
  * materializing a rank column or running window machinery per row.
  * Equivalent to `row_number().over(partitionBy(keys).orderBy(order))
  * <= k` when `order` is a total order within each group (callers should
  * include a tiebreaker column for determinism).
  */
object TopK {

  /** Idempotently add the planner strategy + pruning rule to the session. */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val es = spark.experimental.extraStrategies
    if (!es.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = es :+ TopKPerKeyStrategy
    val eo = spark.experimental.extraOptimizations
    if (!eo.contains(TopKPerKeyPruning))
      spark.experimental.extraOptimizations = eo :+ TopKPerKeyPruning
  }

  /** @param order (columnName, descending?) pairs, applied in sequence */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    ensureStrategy(df.sparkSession)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(attr), sortOrders, k, analyzed))
  }
}
