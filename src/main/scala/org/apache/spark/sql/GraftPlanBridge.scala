package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package bridge for building DataFrames from custom logical
  * plans and extracting catalyst expressions from public Columns —
  * the two `private[sql]` seams every third-party operator library
  * needs. No Spark behavior is modified; this only re-exports two
  * constructors to graft's planner code.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
