package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `Dataset.ofRows` (private[sql]) so graft's custom
  * logical nodes (graft.plans) can be wrapped back into a DataFrame.
  * Lives in the Spark SQL package for access; contains no logic.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
