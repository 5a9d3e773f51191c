package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` doors for [[graft.plans.LakeDmlRules]]: wrapping a
  * catalyst `Expression` back into a public `Column`, and planning a
  * resolved logical subtree as a DataFrame — the two conversions the
  * UPDATE/MERGE rewrite needs to hand analyzer-produced trees to the
  * lake's public row-level API. Same pattern as [[GraftStreamShim]]:
  * no logic here, just access.
  */
object GraftDmlShim {

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
