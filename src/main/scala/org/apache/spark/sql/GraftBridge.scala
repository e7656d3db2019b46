package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor, so graft's
  * custom logical plans (see graft.plans) can surface as ordinary
  * DataFrames. This is the standard extension-library pattern: the
  * SparkSessionExtensions API lets third parties inject analyzer/planner
  * rules but offers no public "DataFrame from LogicalPlan", so extension
  * projects host one forwarding call inside the org.apache.spark.sql
  * package. Nothing else lives here — the private-API surface stays at
  * exactly one call.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
