package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters, so the
  * engine's custom Catalyst expressions (graft.plans) can be exposed as
  * ordinary `Column`s. Spark 4 removed the public `Column(expr)`
  * constructor; `classic.ExpressionUtils` is the supported internal
  * path (used by Spark's own function library).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw logical plan (runs full analysis) —
    * needed to surface custom logical operators (graft.plans) as
    * ordinary DataFrames. */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
