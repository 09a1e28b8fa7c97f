package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: wrap a hand-built logical plan
  * (graft's [[graft.plans.OptimizationFence]]) back into a DataFrame.
  * `Dataset.ofRows` is `private[sql]`, so the accessor lives in this
  * package — the standard packaging every Spark plan-extension
  * library uses; nothing else of the internal surface is exposed. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
